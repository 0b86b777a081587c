"""S9/A5 file ingestion: the BNC ``all.num`` "%d %s %s %d" loader and
the file-driven baseline merge, checked against a line-exact Python
transliteration of the reference's loadCorpus + Init
(corpusfreqlib/corpusfreqlib.go:50-115)."""

import os

from gocrawler_spark.operators import corpus as CO
from gocrawler_spark.queries.crawler_q import _CLASSICAL, _CONTEMP

# --------------------------------------------------------------- oracle
def _load_corpus_ref(path):
    """loadCorpus (corpusfreqlib.go:50-96): Sscanf per line, and a word
    only takes a new value while its stored count is zero."""
    freqs = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split()
            num_total, word = int(parts[0]), parts[1]
            if freqs.get(word, (0,))[0] == 0:
                freqs[word] = (num_total, parts[2], int(parts[3]))
    return freqs


def _merge_ref(eng, cont):
    """Init (corpusfreqlib.go:98-115): int-truncating 'the' scaling."""
    factor = eng["the"][0] / cont["the"][0]
    merged = {w: v[0] for w, v in eng.items()}
    for w, v in cont.items():
        merged[w] = eng.get(w, (0,))[0] + int(factor * v[0])
    return merged


# ---------------------------------------------------------------- tests
def test_loader_parses_fixture(spark):
    df = CO.load_corpus_file(spark, _CLASSICAL)
    rows = df.orderBy("line_no").collect()
    with open(_CLASSICAL) as f:
        raw = [ln.split() for ln in f if ln.strip()]
    assert len(rows) == len(raw)
    assert [r["token"] for r in rows] == [p[1] for p in raw]
    assert [r["num_total"] for r in rows] == [int(p[0]) for p in raw]
    assert rows[0]["token"] == "the"


def test_first_wins_dedup_reference_rule(spark, tmp_path):
    p = str(tmp_path / "c.num")
    with open(p, "w") as f:
        f.write(
            "10 alpha at0 1\n"
            "3 alpha at0 1\n"   # later duplicate loses
            "0 beta nn1 1\n"
            "7 beta nn1 1\n"    # zero-count slot is overwritten
            "0 gamma nn1 1\n"
            "0 gamma nn1 2\n"   # all-zero: last zero line stands
        )
    got = {
        r["token"]: r["num_total"]
        for r in CO.dedup_first_wins(CO.load_corpus_file(spark, p)).collect()
    }
    want = {w: v[0] for w, v in _load_corpus_ref(p).items()}
    assert got == want == {"alpha": 10, "beta": 7, "gamma": 0}


def test_first_wins_oracle_sql_matches_engine_on_unsorted_file(
    spark, tmp_path
):
    """The DuckDB-oracle dedup must state the reference's
    first-nonzero-line-wins rule itself (corpusfreqlib.go:88-91), not a
    MAX(num_total) that only coincides with it on frequency-sorted
    files: engine, oracle SQL, and the Python transliteration must
    agree on a file that is NOT frequency-sorted."""
    import duckdb

    from gocrawler_spark.queries.crawler_q import _first_wins_sql

    p = str(tmp_path / "u.num")
    with open(p, "w") as f:
        f.write(
            "0 alpha at0 1\n"   # zero holds the slot...
            "5 beta nn1 1\n"
            "7 alpha at0 2\n"   # ...first NONZERO wins (7, not max 9)
            "9 alpha at0 3\n"
            "0 gamma nn1 1\n"
            "0 gamma nn1 2\n"   # all-zero: last line stands
            "3 beta nn1 9\n"    # later smaller value loses to first 5
        )
    eng = {
        r["token"]: r["num_total"]
        for r in CO.dedup_first_wins(CO.load_corpus_file(spark, p)).collect()
    }
    sql = dict(
        duckdb.sql(
            "SELECT token, num_total FROM (" + _first_wins_sql(p) + ")"
        ).fetchall()
    )
    ref = {w: v[0] for w, v in _load_corpus_ref(p).items()}
    assert eng == sql == ref == {"alpha": 7, "beta": 5, "gamma": 0}
    # the oracle's line numbering must come from the DATA, not from
    # scan order: with preserve_insertion_order=false (DuckDB's
    # memory-pressure config) an empty OVER () returns arbitrary order
    # and a scan-order-based line_no silently evaluates the first-wins
    # rule over it (ADVICE r4)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    unordered = dict(
        con.execute(
            "SELECT token, num_total FROM (" + _first_wins_sql(p) + ")"
        ).fetchall()
    )
    assert unordered == ref


def test_baseline_merge_matches_reference_semantics(spark):
    c = CO.load_corpus_file(spark, _CLASSICAL)
    m = CO.load_corpus_file(spark, _CONTEMP)
    got = {
        r["token"]: r["num_total"]
        for r in CO.merge_baselines(c, m).collect()
    }
    want = _merge_ref(_load_corpus_ref(_CLASSICAL), _load_corpus_ref(_CONTEMP))
    assert got == want
    # the normalization anchor itself: eng_the + int(factor * cont_the)
    # = eng_the + int(eng_the) since factor * cont_the == eng_the exactly
    assert got["the"] == 2 * 6187267


def test_fixture_files_exist_and_have_dups():
    for p in (_CLASSICAL, _CONTEMP):
        assert os.path.exists(p)
        words = [ln.split()[1] for ln in open(p) if ln.strip()]
        assert len(words) > len(set(words))  # dedup path is exercised


# ------------------------------------------------- S8 snapshot file sinks
from gocrawler_spark.sinks import corpus_files as CF


def _freq_df(spark):
    return spark.createDataFrame(
        [("the", 50), ("covid", 12), ("beta", 12), ("alpha", 3)],
        "token string, count long",
    )


def test_allnum_snapshot_order_and_round_trip(spark, tmp_path):
    path = str(tmp_path / "corpusFrequencies.txt")
    CF.write_freq_allnum(_freq_df(spark), path)
    # W1 total order: count desc, ties token desc (crawler.go:705-718);
    # line format "%d %s %s %d" with none/0 (crawler.go:1298)
    assert open(path).read() == (
        "50 the none 0\n12 covid none 0\n12 beta none 0\n3 alpha none 0\n"
    )
    back = CO.load_corpus_file(spark, path)
    assert {(r["token"], r["num_total"]) for r in back.collect()} == {
        ("the", 50), ("covid", 12), ("beta", 12), ("alpha", 3),
    }


def test_basic_snapshot_format_and_topk(spark, tmp_path):
    path = str(tmp_path / "noeng.txt")
    CF.write_freq_basic(_freq_df(spark), path, limit_k=2)
    assert open(path).read() == "50 the\n12 covid\n"


def test_snapshot_corpus_files_matches_reference_math(spark, tmp_path):
    baseline = spark.createDataFrame(
        [("the", 100), ("covid", 0), ("alpha", 4)],
        "token string, num_total long",
    )
    out = CF.snapshot_corpus_files(_freq_df(spark), baseline, str(tmp_path))
    # scale = (1+100)/50; adj = obs - int(20*(1+base)/scale)  (crawler.go:1305-1328)
    scale = (1 + 100) / 50
    exp = {
        "the": 50 - int(20 * 101 / scale),
        "covid": 12 - int(20 * 1 / scale),
        "beta": 12 - int(20 * 1 / scale),
        "alpha": 3 - int(20 * 5 / scale),
    }
    lines = [
        ln.split() for ln in open(out["corpusNoEngFrequencies"]) if ln.strip()
    ]
    got = {tok: int(cnt) for cnt, tok in lines}
    assert got == exp
    # file is in W1 total order of the ADJUSTED counts
    counts = [int(cnt) for cnt, _ in lines]
    assert counts == sorted(counts, reverse=True)
    assert open(out["corpusFrequencies"]).readline() == "50 the none 0\n"


def test_engine_snapshot_files_match_state(spark, tmp_path):
    """CrawlEngine.snapshot_files emits the reference's checkpoint file
    with exactly the engine's corpus_freq state, W1-ordered."""
    from gocrawler_spark.plans.crawl import CrawlEngine
    from tests.test_crawl_e2e import _tp

    eng = CrawlEngine(spark, _tp(wave_size=1))
    st = eng.run(max_steps=6)
    out = eng.snapshot_files(str(tmp_path))
    lines = [
        ln.split() for ln in open(out["corpusFrequencies"]) if ln.strip()
    ]
    got = {tok: int(cnt) for cnt, tok, _, _ in lines}
    want = {r["token"]: r["count"] for r in st.corpus_freq.collect()}
    assert got == want
    pairs = [(int(cnt), tok) for cnt, tok, _, _ in lines]
    # W1 total order: count desc, ties token desc
    assert pairs == sorted(pairs, reverse=True)  # desc count, desc token


# --------------------------------------------------------------- W6
def test_kv_remove_at_matches_go_append_semantics(spark):
    """kvSliceRemoveItem (crawler.go:940-945): append(s[:i], s[i+1:]...)
    deletes index i of the rank-ordered slice, preserving the rest in
    order. Compare against the same operation on the Python list."""
    from pyspark.sql import Row

    rows = [
        Row(token="the", count=9),
        Row(token="spark", count=7),
        Row(token="query", count=7),  # tie broken token desc: spark first
        Row(token="join", count=2),
    ]
    df = spark.createDataFrame(rows)
    ranked = [("the", 9), ("spark", 7), ("query", 7), ("join", 2)]
    for s in range(len(ranked)):
        got = [
            (r["token"], r["count"])
            for r in CO.rsort(CO.kv_remove_at(df, s)).collect()
        ]
        want = ranked[:s] + ranked[s + 1 :]
        assert got == want, (s, got, want)


def test_golden_run_snapshot_files_byte_exact(spark, tmp_path):
    """The reference's demo-loop artifact end-to-end FROM FILES
    (README.md:45-51, crawler.go:1285-1341): scale-mode crawl →
    corpus freqs → file-driven baseline merge → 'the'-anchored
    background subtraction → BOTH checkpoint file formats. Expected
    bytes come from a pure-Python twin: the WaveOracle's corpus
    frequencies + this module's line-exact loadCorpus/Init
    transliteration + the subtraction formula, formatted per
    crawler.go:1296-1300 (all.num) and :1337-1341 (basic)."""
    from gocrawler_spark.oracle.pyoracle import WaveOracle
    from gocrawler_spark.queries.crawler_q import _scale_state
    from gocrawler_spark.sources import synthetic_web as SW
    from tests.test_crawl_e2e import _tp

    # independent Python side -------------------------------------
    worc = WaveOracle(_tp(wave_size=8, per_host_budget=2), SW.fetch_page)
    worc.run(max_iters=8)
    corpus = worc.res.corpus_freqs
    merged = _merge_ref(
        _load_corpus_ref(_CLASSICAL), _load_corpus_ref(_CONTEMP)
    )
    order = sorted(corpus.items(), key=lambda t: (t[1], t[0]), reverse=True)
    assert order[0][0] == "the", "anchor precondition"
    scale = float(1 + merged.get("the", 0)) / float(corpus["the"])
    noeng = {
        tok: cnt - int(20.0 * (1.0 + merged.get(tok, 0)) / scale)
        for tok, cnt in corpus.items()
    }
    noeng_order = sorted(
        noeng.items(), key=lambda t: (t[1], t[0]), reverse=True
    )
    want_allnum = "".join(f"{c} {t} none 0\n" for t, c in order)
    want_basic = "".join(f"{c} {t}\n" for t, c in noeng_order)

    # engine side -------------------------------------------------
    st = _scale_state(spark)
    baseline = CO.merge_baselines(
        CO.load_corpus_file(spark, _CLASSICAL),
        CO.load_corpus_file(spark, _CONTEMP),
    )
    out = CF.snapshot_corpus_files(st.corpus_freq, baseline, str(tmp_path))
    assert open(out["corpusFrequencies"]).read() == want_allnum
    assert open(out["corpusNoEngFrequencies"]).read() == want_basic
