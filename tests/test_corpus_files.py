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
