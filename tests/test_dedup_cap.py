"""Skew control in dedup_ngram_jaccard: a boilerplate shingle shared by
more documents than JACCARD_DF_CAP must not generate candidate pairs —
the quadratic hot key is cut before the self-join — while genuinely
similar pairs (sharing sub-cap shingles) are still found."""

from gocrawler_spark.queries.dedup_q import JACCARD_DF_CAP, dedup_ngram_jaccard


def _mk_docs(spark, tmp_path):
    # Need > 3-token sentences of non-stopword tokens; content words are
    # invented so the analyzer keeps them.
    boiler = "zonalux quarzite brellum vantorix cregmal ottovane plimberg drexal"
    rows = []
    # 1. hot-key block: JACCARD_DF_CAP + 20 docs share the boilerplate,
    #    each with a short unique tail -> without the cap every pair of
    #    them clears the 0.03 jaccard floor (quadratic blowup)
    for i in range(JACCARD_DF_CAP + 20):
        rows.append(
            (i, f"{boiler} uniqua{i} seconda{i} tertia{i} quarta{i}", "en")
        )
    # 2. one genuine near-dup pair with private (sub-cap) shingles
    real = (
        "marvolex tandrine quiblast forvetta grumlock sephirane "
        "voltaric bremshaw caldrix monteblane"
    )
    rows.append((500, real + " extraword", "en"))
    rows.append((501, real + " otherword", "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_hot_shingle_is_capped_but_real_pairs_survive(spark, tmp_path):
    sf_dir = _mk_docs(spark, tmp_path)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard_micro"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    # the only surviving pair is the genuine near-dup
    assert set(pairs) == {(500, 501)}
    assert pairs[(500, 501)] > 500_000  # they share most shingles
