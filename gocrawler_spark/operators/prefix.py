"""Distributed ordered prefix sum — no single-partition window.

`F.sum(x).over(Window.orderBy(k))` funnels every row through ONE task
(Spark warns: "No Partition Defined for Window operation"). That is
the textbook scale-killer for concat-and-chunk layouts (sequence
packing, webdataset shard packing) whose only "hard" step is a global
running total in ingest order.

`exclusive_prefix_sum` decomposes it the same way the frontier's
`_assign_seq` does (operators/frontier.py:33-80), generalized to a
flat numeric order key:

1. bucket rows by order-preserving ranges of the key
   (``(k - lo) * n_buckets div (hi - lo + 1)`` — lo/hi come from a
   broadcast 1-row aggregate, so the plan stays lazy, no driver
   action);
2. cumsum WITHIN each bucket: window partitioned by bucket — fully
   parallel, each task sees ~n/n_buckets rows;
3. per-bucket totals: one row per bucket (n_buckets ≈ thousands, not
   billions); each bucket's global starting offset = the sum of all
   strictly-smaller buckets' totals via a broadcast theta-join —
   O(n_buckets²) tiny pairs, NO single-partition window anywhere in
   the plan (even a window over n_buckets rows plans a
   single-partition WindowExec and fires Spark's "No Partition
   Defined" warning);
4. broadcast the offsets back onto the buckets.

The result is byte-identical to the global window whenever the order
key is unique (asserted by tests/test_prefix.py property test); ties
would make "exclusive prefix" ambiguous the same way they do for the
global window, so unique keys are a documented precondition.

Cost: one extra small shuffle (step 3's n_buckets rows) versus the
global window's serial bottleneck. At 1e10 rows with 4096 buckets each
task cumsums ~2.4M rows — embarrassingly parallel; step 3 is ~16M
broadcast-joined pairs, also parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "prefix",
    n_buckets: int = 1024,
) -> DataFrame:
    """Add `out_col` = sum of `val_col` over all rows with a strictly
    smaller `order_col` (exclusive running total in key order).

    `order_col` must be numeric and unique per row. Output schema is
    the input plus `out_col` (long); no other columns are touched.
    """
    k = F.col(order_col).cast("long")

    # order-preserving range bucketing; the (lo, hi) scalar rides in as
    # a broadcast single-row join so the whole plan stays declarative
    rng = df.agg(
        F.min(k).alias("__lo"), F.max(k).alias("__hi")
    )
    b = df.join(F.broadcast(rng)).withColumn(
        "__bucket",
        ((k - F.col("__lo")) * n_buckets / (F.col("__hi") - F.col("__lo") + 1))
        .cast("long"),
    )

    in_bucket = Window.partitionBy("__bucket").orderBy(k)
    local = b.withColumn(
        "__local",
        F.sum(F.col(val_col)).over(in_bucket) - F.col(val_col),
    )

    # one row per bucket -> global offsets. Not an ordered window: even
    # over n_buckets rows, Window.orderBy() plans a single-partition
    # WindowExec and Spark's "No Partition Defined" warning fires —
    # indistinguishable in logs from a real row-scale scale-killer. A
    # broadcast theta-join cumulative (sum of all strictly-smaller
    # buckets' totals) is O(n_buckets²) pairs ≈ 1M rows at the default
    # 1024 — trivially parallel, and the plan carries no
    # single-partition stage at all.
    tot = b.groupBy("__bucket").agg(F.sum(F.col(val_col)).alias("__tot"))
    prior = tot.select(
        F.col("__bucket").alias("__b2"), F.col("__tot").alias("__tot2")
    )
    totals = (
        tot.join(F.broadcast(prior), F.col("__b2") < F.col("__bucket"), "left")
        .groupBy("__bucket")
        .agg(F.coalesce(F.sum("__tot2"), F.lit(0)).alias("__offset"))
        .select("__bucket", "__offset")
    )

    return (
        local.join(F.broadcast(totals), "__bucket")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__bucket", "__lo", "__hi", "__local")
    )


def total_order_rank(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rnk",
    n_parts: int | None = None,
    pin=None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` without the global window's
    single-partition WindowExec — the same decomposition as
    exclusive_prefix_sum, for composite/non-numeric sort keys:

    1. ``repartitionByRange`` on the order expressions — partition i
       holds a contiguous key range ordered before partition i+1's;
    2. rank WITHIN each range partition (window partitioned by
       ``spark_partition_id()`` — fully parallel);
    3. global offset per partition = rows in all earlier partitions,
       via a broadcast theta-join over ONE ROW PER PARTITION.

    The repartitioned frame is PINNED before fan-out (``pin``,
    default eager localCheckpoint): range boundaries come from a
    sampling pass, and the rank and count branches must see the SAME
    boundaries — relying on Catalyst's exchange reuse to guarantee
    that would be a silent-wrong-answer hazard, not an optimization.

    Ranks equal the global window's whenever the order key is unique
    (row_number over ties is ambiguous either way — same documented
    precondition as exclusive_prefix_sum)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    if pin is None:
        pin = lambda d: d.localCheckpoint(eager=True)  # noqa: E731
    srt = pin(df.repartitionByRange(n_parts, *order_by))
    part = srt.withColumn("__pid", F.spark_partition_id())
    local = part.withColumn(
        "__local", F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by))
    )
    cnt = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    prior = cnt.select(F.col("__pid").alias("__p2"), F.col("__n").alias("__n2"))
    offsets = (
        cnt.join(F.broadcast(prior), F.col("__p2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__n2"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )
