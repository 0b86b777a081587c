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
