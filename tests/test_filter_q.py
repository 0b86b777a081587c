"""Edge-case semantics for the corpus-filtering queries (filter_q):
crafted documents with known rule outcomes, checked on the Spark path
AND cross-checked against the DuckDB oracle SQL on the same crafted
table (the sf0.001 sweep runs in test_queries_oracle)."""

import duckdb
import pytest

from gocrawler_spark.queries import ORACLES, QUERIES
from gocrawler_spark.queries.compare import _rows

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs far away. "
) * 10  # 130 words, prose-like, has the/and/that-ish stopwords

DOCS = [
    (0, GOOD, "en", "src0", len(GOOD)),
    (1, "short doc", "en", "src0", 9),  # n_words < 50 -> drop
    (2, "- one\n- two\n- three\n- four", "en", "src1", 26),  # all bullets
    (3, "same line\nsame line\nsame line\nother", "en", "src1", 35),  # dup lines
    (4, "tick tock " * 40, "en", "src2", 400),  # one dominant bigram
    (5, "#### " * 10 + GOOD, "en", "src2", 50 + len(GOOD)),  # symbols
]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("filterq")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _spark_vs_duck(spark, crafted_dir, name):
    sdf = QUERIES[name](spark, crafted_dir)
    s_rows = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(ORACLES[name])
    d_rows = _rows([c[0] for c in res.description], res.fetchall())
    con.close()
    assert s_rows == d_rows, f"{name}: spark != duckdb on crafted docs"
    return {r[0]: r for r in [tuple(x) for x in sdf.collect()]}


def test_gopher_rules_on_crafted_docs(spark, crafted_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["gopher_quality_filter"](spark, crafted_dir).collect()
    }
    assert rows[0]["keep"] == 1  # prose passes every gate
    assert rows[1]["keep"] == 0 and rows[1]["n_words"] == 2  # too short
    assert rows[2]["bullet_ppm"] == 1000000  # every line is a bullet
    assert rows[5]["symbol_ppm"] > 100000 and rows[5]["keep"] == 0
    _spark_vs_duck(spark, crafted_dir, "gopher_quality_filter")


def test_repetition_on_crafted_docs(spark, crafted_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["repetition_stats"](spark, crafted_dir).collect()
    }
    # doc 3: 4 lines, "same line" x3 -> 2 dups -> 500000 ppm
    assert rows[3]["dup_line_ppm"] == 500000
    # doc 4: "tick tock" x40 -> bigram "tick tock" count 40 of 79 bigrams,
    # 80 tokens -> 2*40/80 = 1000000 ppm
    assert rows[4]["n_tok"] == 80 and rows[4]["top_bigram_ppm"] == 1000000
    _spark_vs_duck(spark, crafted_dir, "repetition_stats")


def test_oov_on_crafted_docs(spark, crafted_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["oov_quality"](spark, crafted_dir).collect()
    }
    # "tick"/"tock" appear 40x each -> in vocab; doc 4 fully in-vocab
    assert rows[4]["n_oov"] == 0 and rows[4]["oov_ppm"] == 0
    assert rows[4]["mean_vocab_cnt"] == 40
    # doc 1: "short doc" -> both tokens appear only once corpus-wide
    assert rows[1]["n_oov"] == 2 and rows[1]["oov_ppm"] == 1000000
    assert rows[1]["mean_vocab_cnt"] == 0
    _spark_vs_duck(spark, crafted_dir, "oov_quality")


def test_curation_verdict_consistency(spark):
    """keep=1 iff every gate passes; drop_reason is the first failing
    gate and empty exactly for keepers."""
    rows = QUERIES["curation_verdict"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    order = [
        ("is_benchmark", "benchmark"),
        ("is_exact_dup", "exact_dup"),
        ("is_near_dup", "near_dup"),
        ("contaminated", "contaminated"),
        ("low_quality", "low_quality"),
    ]
    for r in rows:
        flags = [r[c] for c, _ in order]
        assert r["keep"] == int(not any(flags))
        want = next((name for (c, name), f in zip(order, flags) if f), "")
        assert r["drop_reason"] == want
    # the funnel is non-trivial on the test data: some kept, some of
    # each early drop reason present
    reasons = {r["drop_reason"] for r in rows}
    assert "" in reasons and "benchmark" in reasons


def test_pii_scrub_counts_and_redaction(spark):
    """Hand-verified expectations over the inline PII fixture: the
    SSN-shaped and separator-free digit runs must NOT match, invalid
    octets must not match IPv4, and redaction order is emails first."""
    from gocrawler_spark.queries.filter_q import pii_scrub_stats

    rows = {
        r["doc_id"]: r
        for r in pii_scrub_stats(spark, "/root/testdata/sf0.001").collect()
    }
    want = {
        0: (1, 0, 0),
        1: (0, 2, 0),
        2: (0, 0, 2),
        3: (1, 0, 1),
        4: (0, 0, 0),
        5: (0, 0, 0),  # 5551234567: no separators -> not a phone
        6: (1, 1, 1),
        7: (0, 0, 1),  # 256.1.1.1 invalid octet; \b blocks a 56.1.1.1 match
        8: (2, 0, 0),
        9: (0, 0, 0),  # SSN-shaped 123-45-6789 must not match the phone rx
    }
    got = {
        k: (r["n_emails"], r["n_phones"], r["n_ipv4"]) for k, r in rows.items()
    }
    assert got == want
    assert rows[0]["redacted"] == "contact me at <EMAIL> for details"
    assert rows[6]["redacted"] == "mixed: <EMAIL> then <PHONE> then <IP>"
    for r in rows.values():
        assert r["redacted_len"] == len(r["redacted"])
