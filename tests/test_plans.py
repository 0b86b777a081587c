"""Physical-plan regression tests: the properties that make these
queries viable at 100 TB must not silently regress — filters reach the
parquet scan, scans read only the projected columns, small dimensions
broadcast instead of shuffling the fact table."""

import re

import pytest

from gocrawler_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name):
    return (
        QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _pushed(plan):
    return [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]


def _read_schemas(plan):
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_tpch_q1_filter_pushdown(spark):
    plan = _plan(spark, "tpch_q1_pricing")
    assert any("l_shipdate" in p for p in _pushed(plan)), plan


def test_tpch_q3_broadcasts_dims_and_prunes(spark):
    plan = _plan(spark, "tpch_q3_toporders")
    assert any("c_mktsegment" in p and "BUILDING" in p for p in _pushed(plan))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # every scan reads a handful of columns, never the full table
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 4, s


def test_tpch_q5_broadcasts_dims(spark):
    plan = _plan(spark, "tpch_q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_corpus_freq_pushdown_and_pruning(spark):
    # the token-frequency relation is session-materialized (memo_result)
    # — assert the properties on the plan that BUILDS it
    from gocrawler_spark.queries.crawler_q import _en_token_freq

    plan = (
        _en_token_freq.__wrapped__(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any("lang" in p and "en" in p for p in _pushed(plan)), plan
    # reads only (lang, text) — never url/doc_id/etc.
    schemas = _read_schemas(plan)
    assert schemas and all(len(s.split(",")) <= 2 for s in schemas), schemas


def test_topk_becomes_take_ordered(spark):
    """sort+limit must plan as TakeOrderedAndProject, not a global
    sort."""
    plan = _plan(spark, "corpus_freq_top100")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["events_hourly", "frontier_priority_topk"])
def test_narrow_scans(spark, name):
    plan = _plan(spark, name)
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 4, (name, s)


def test_gopher_filter_is_scan_only(spark):
    """The quality gate is one codegen projection over the scan — no
    shuffle, no join, no Python."""
    # memoized: inspect the building plan
    from gocrawler_spark.queries.filter_q import gopher_quality_filter
    plan = (
        gopher_quality_filter.__wrapped__(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in gopher plan"


def test_oov_vocab_broadcasts(spark):
    plan = _plan(spark, "oov_quality")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_no_cartesian_and_narrow_scan(spark):
    plan = _plan(spark, "repetition_stats")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 2, s


def test_span_dedup_narrow_scan_no_cartesian(spark):
    plan = _plan(spark, "span_dedup_coverage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # reads only (doc_id, text)
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 2, s


def test_image_embedding_near_dups_narrow_scan_no_cartesian(spark):
    plan = _plan(spark, "image_embedding_near_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the documents scan feeding the image derivation reads only
    # (doc_id, text) — payload bytes exist only inside the map stage
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 2, s


def test_incremental_probe_equijoin_and_narrow_scan(spark):
    plan = _plan(spark, "minhash_incremental_probe")
    assert "CartesianProduct" not in plan
    # the probe->index candidate join and the verify joins must be
    # equijoins (hash/sort-merge); the only nested-loops allowed are
    # the broadcast 16-row perms expansions inside banding (the
    # subtree repeats textually once per consumer of the candidate
    # relation, so count SortMergeJoin/ShuffledHashJoin presence, not
    # BNLJ absence)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    for m in re.finditer(r"BroadcastNestedLoopJoin BuildRight, (\w+)", plan):
        assert m.group(1) in ("Cross", "Inner"), m.group(0)
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 3, s


def test_range_join_is_hash_equijoin(spark):
    """The whole point of bucket-expansion: the interval lookup must
    plan as a broadcast HASH join on the grid cell, never the
    BroadcastNestedLoopJoin a plain non-equi predicate produces."""
    plan = _plan(spark, "events_value_range_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_window_no_join(spark):
    """The as-of attribution is the union+running-window formulation:
    no join operator at all (and so no per-user range expansion) —
    one window over the unioned stream."""
    plan = _plan(spark, "events_attribution_asof")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert bad not in plan, bad
    assert "Window" in plan


def test_pagerank_and_packing_no_cartesian(spark):
    for name in ("events_pagerank", "sequence_packing", "events_rollup_multi"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_unigram_lm_joins_broadcast(spark):
    """The LM (top-K vocab) and the 1-row total must broadcast against
    the token stream — a sort-merge join here would shuffle the whole
    exploded-token relation a second time at 100 TB."""
    plan = _plan(spark, "unigram_lm_nll")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # reads only (doc_id, text)
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 2, s


def test_host_quality_stats_single_agg_scan(spark):
    """One groupBy on the host key; no join, no Python stage."""
    plan = _plan(spark, "host_quality_stats")
    for bad in ("Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in host_quality_stats plan"
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 4, s


def test_minhash_jaccard_estimate_no_pair_space(spark):
    """Candidates come from the band-bucket equijoin; no cartesian or
    nested-loop pair enumeration anywhere in the plan."""
    plan = _plan(spark, "minhash_jaccard_estimate")
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin-free guarantee: candidate join
    # and verify join are hash equijoins
    assert "BroadcastNestedLoopJoin" not in plan


def test_stemmed_corpus_vocab_bounded_python(spark):
    """T6 scale shape: Python (MapInPandas) touches ONLY the distinct
    vocab relation and its output is broadcast back onto the freq
    aggregate — never a Python eval over corpus rows — and the top-k
    is TakeOrderedAndProject, not a full sort."""
    plan = _plan(spark, "stemmed_corpus_top100")
    assert plan.count("MapInPandas") == 1
    # the stem map is the broadcast build side of the join
    bcast = plan[plan.index("BroadcastExchange"):]
    assert "MapInPandas" in bcast
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
