"""Physical-plan regressions for the ranked-retrieval / mixture
queries (queries/search_q.py): predicate pushdown, column pruning,
filter-before-shuffle, and payload-byte hygiene must hold — these are
the properties that keep the family viable at 100 TB."""

import re

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


def test_inverted_index_pushdown_and_pruning(spark):
    plan = _plan(spark, "inverted_index_stats")
    # lang='en' reaches the parquet scan; scans read only 3 columns
    assert any("lang" in p for p in _pushed(plan)), plan
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 3, s
    # top-200 is a TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Sort .*global=true", plan)


def test_bm25_filters_terms_before_any_shuffle(spark):
    plan = _plan(spark, "bm25_topk")
    # the query-term IN predicate sits between the token explode and
    # the first aggregation — the scored relation is O(matching docs)
    gen_side = plan.split("Filter token")
    assert len(gen_side) >= 2, plan
    assert "IN (join,window,vector,spark)" in plan
    # idf / corpus stats are broadcast dims; no sort-merge join anywhere
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_tfidf_window_is_partitioned_and_group_limited(spark):
    plan = _plan(spark, "tfidf_topterms")
    # per-doc top-3: partitioned window + WindowGroupLimit pre-filter
    # (rank rows are dropped partition-locally, not post-window)
    assert "WindowGroupLimit" in plan, plan
    assert "windowspecdefinition(doc_id" in plan
    assert any("lang" in p for p in _pushed(plan))


def test_domain_mixture_reads_two_columns(spark):
    plan = _plan(spark, "domain_mixture_weights")
    # scan-side projection: text + source only; the OVER () windows
    # run on the one-row-per-source dim, after the groupBy
    schemas = _read_schemas(plan)
    assert schemas and all(len(s.split(",")) <= 2 for s in schemas), plan
    # plans print top-down: the OVER () windows sit ABOVE the source
    # aggregation (they consume the per-source dim, not the corpus)
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_image_shard_packing_drops_payload_before_shuffle(spark):
    plan = _plan(spark, "image_shard_packing")
    # the bytes/caption payload columns are projected away between the
    # decode UDF and the window's exchange — payload bytes never shuffle
    m = re.search(r"Project \[[^\]]*\]\s*\n\s*\+- MapInPandas", plan)
    assert m is not None, plan
    assert "bytes" not in m.group(0).split("MapInPandas")[0], m.group(0)
    assert any("doc_id" in p and "300" in p for p in _pushed(plan)), plan


def test_dsir_broadcasts_model_and_prunes_scan(spark):
    plan = _plan(spark, "dsir_importance_weights")
    # the 512-row llr model and the bucket-count dims join as
    # broadcasts — the corpus-sized feature relation never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    # top-50 by (weight, doc_id) is a TakeOrderedAndProject
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Sort .*global=true", plan)
    # scans read only the columns the features need
    for s in _read_schemas(plan):
        assert len(s.split(",")) <= 3, s
