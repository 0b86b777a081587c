"""exclusive_prefix_sum must be byte-identical to the global ordered
window it replaces, and must not funnel rows through one task."""

import random

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from gocrawler_spark.operators.prefix import exclusive_prefix_sum


def _global(df, order_col, val_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "prefix", F.coalesce(F.sum(val_col).over(w), F.lit(0)).cast("long")
    )


def _check(spark, rows, n_buckets=16):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["prefix"]
        for r in exclusive_prefix_sum(
            df, "k", "v", "prefix", n_buckets=n_buckets
        ).collect()
    }
    want = {r["k"]: r["prefix"] for r in _global(df, "k", "v").collect()}
    assert got == want


def test_matches_global_window_random(spark):
    rng = random.Random(7)
    keys = rng.sample(range(-500, 10_000), 800)
    rows = [Row(k=k, v=rng.randrange(0, 4000)) for k in keys]
    _check(spark, rows)


def test_sparse_and_clustered_keys(spark):
    # keys clustered at both ends of the range: most buckets empty,
    # two buckets hold everything — offsets must still line up
    rows = [Row(k=k, v=k % 13 + 1) for k in range(20)] + [
        Row(k=1_000_000 + k, v=k + 1) for k in range(20)
    ]
    _check(spark, rows, n_buckets=64)


def test_single_row_and_zero_values(spark):
    _check(spark, [Row(k=42, v=0)])
    _check(spark, [Row(k=1, v=0), Row(k=2, v=0), Row(k=3, v=5)])


def test_no_single_partition_window_in_plan(spark):
    """NO unpartitioned window anywhere in the plan: the row-scale
    cumsum is partitioned by __bucket, and the per-bucket offsets are
    a broadcast theta-join cumulative, not an ordered window — so
    Spark's "No Partition Defined for Window" warning can never fire
    from this operator (round-3 verdict nit #1)."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    plan = (
        exclusive_prefix_sum(df, "k", "v", n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    windows = re.findall(r"Window \[[^\]]*\], (\[[^\]]*\])", plan)
    unpartitioned = [w for w in windows if w == "[]"]
    bucketed = [w for w in windows if "__bucket" in w]
    assert not unpartitioned, plan
    assert bucketed, plan


def test_packing_queries_still_match_oracle(spark):
    """The two rewired queries stay green against their DuckDB oracles
    after the prefix-sum swap (full value compare at test SF)."""
    import os

    from gocrawler_spark.queries import ORACLES, QUERIES
    from gocrawler_spark.queries.compare import compare

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for name in ("sequence_packing", "image_shard_packing"):
        ok, msg = compare(spark, sf, QUERIES[name], ORACLES[name])
        assert ok, f"{name}: {msg}"


def _rank_global(df, cols):
    w = Window.orderBy(*cols)
    return df.withColumn("rnk", F.row_number().over(w).cast("long"))


def test_total_order_rank_matches_global_window(spark):
    """total_order_rank == row_number() over the global ORDER BY on a
    composite desc/asc key (unique per row), including clustered and
    negative values."""
    from gocrawler_spark.operators.prefix import total_order_rank

    rng = random.Random(11)
    rows = [
        Row(pr=rng.randrange(-50, 50), node=i)  # pr ties, node unique
        for i in rng.sample(range(10_000), 700)
    ]
    df = spark.createDataFrame(rows, "pr long, node long")
    cols = [F.desc("pr"), F.asc("node")]
    got = {
        (r["pr"], r["node"]): r["rnk"]
        for r in total_order_rank(df, cols, n_parts=8).collect()
    }
    want = {
        (r["pr"], r["node"]): r["rnk"] for r in _rank_global(df, cols).collect()
    }
    assert got == want and len(got) == 700


def test_total_order_rank_plan_has_no_unpartitioned_window(spark):
    from gocrawler_spark.operators.prefix import total_order_rank

    df = spark.range(500).select(
        (F.col("id") % 97).alias("pr"), F.col("id").alias("node")
    )
    out = total_order_rank(df, [F.desc("pr"), F.asc("node")], n_parts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[[^\]]*\], (\[[^\]]*\])", plan)
    assert windows and all(w != "[]" for w in windows), plan


def test_events_pagerank_plan_has_no_unpartitioned_window(spark):
    """The pagerank total-order ranking (the one remaining row-scale
    global window in the query surface) now goes through
    total_order_rank — assert the executed plan carries no
    unpartitioned WindowExec."""
    import os
    import re

    from gocrawler_spark.queries import QUERIES

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = QUERIES["events_pagerank"](spark, sf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    windows = re.findall(r"Window \[[^\]]*\], (\[[^\]]*\])", plan)
    assert all(w != "[]" for w in windows), plan
