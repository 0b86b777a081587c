"""Distributed EXACT order statistics — no global sort, no sketch.

The standard Spark answers to "give me p50/p90/p99" are a global
``orderBy`` (full-data sort: one all-to-all shuffle of the entire
relation just to read k rows) or ``percentile_approx`` (a mergeable GK
sketch: scalable but approximate, and its error bound is engine
tuning, not a result you can oracle-check). Exact selection at scale
needs neither: the classic two-pass bucket-histogram selection used by
distributed sort-free selection algorithms (Blum et al. selection
generalized to partitioned data):

1. one aggregate for (min, max, count) — 1 row to the driver;
2. one histogram pass: integer range-bucket each value
   (``(v - lo) * B div (hi - lo + 1)`` — pure long arithmetic, order-
   preserving), count per bucket — ≤ B rows to the driver;
3. driver-side (on ≤ B integers): cumulative counts locate, for each
   requested quantile, its target bucket and the residual rank WITHIN
   that bucket — DuckDB ``quantile_disc`` rank semantics,
   ``k = max(1, ceil(q·n))`` over the ascending order, replicated in
   IEEE double so both engines pick the identical element;
4. one selection pass over ONLY the target buckets (expected n/B rows
   each): ``row_number`` partitioned by bucket, ordered by value,
   equi-joined against the broadcast (bucket, rank, q) lookup.

Shuffle accounting at 1e10 rows, B = 4096: pass 2 shuffles B partial
histograms per task (bytes, not rows); pass 4 shuffles only the rows
of the probed buckets (~n/B per quantile's bucket ≈ 2.4M rows), NOT
the relation. Nothing row-scale ever passes through one task — the
same bounded-partition argument as operators/prefix.py.

Preconditions (documented, asserted by tests): integer-typed value
column; ``(hi - lo) * n_buckets`` must fit in int64 (true for any
length/count/size-like metric). Heavy duplication of a SINGLE value
concentrates its bucket (range bucketing cannot split equal values);
the all-equal degenerate case is short-circuited driver-side, and the
general fix — one recursive refinement inside the hot bucket — keeps
the same plan shape if a profile ever needs it.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc's element rank (1-based, ascending):
    k = max(1, ceil(q * n)), the product taken in IEEE double."""
    return max(1, math.ceil(q * n))


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """(q_ppm long, value long) — the exact q-th discrete quantile of
    ``df[col]`` for every q in ``qs``, matching DuckDB
    ``quantile_disc`` element-for-element."""
    spark = df.sparkSession
    out_schema = "q_ppm long, value long"
    ppms = [int(round(q * 1_000_000)) for q in qs]

    stats = df.agg(
        F.min(F.col(col).cast("long")).alias("lo"),
        F.max(F.col(col).cast("long")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return spark.createDataFrame([], out_schema)
    if lo == hi:
        # all values equal: every quantile is that value (and the
        # single range bucket could not split them anyway)
        return spark.createDataFrame([(p, lo) for p in ppms], out_schema)

    v = F.col(col).cast("long")
    bucket = ((v - F.lit(lo)) * n_buckets / (F.lit(hi) - F.lit(lo) + 1)).cast(
        "long"
    )
    hist = dict(
        df.select(bucket.alias("__bucket"))
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )

    # driver-side selection over <= n_buckets integers
    lookup = []  # (bucket, within_rank, q_ppm)
    for q, ppm in zip(qs, ppms):
        k = _disc_rank(q, n)
        cum = 0
        for b in sorted(hist):
            if cum + hist[b] >= k:
                lookup.append((b, k - cum, ppm))
                break
            cum += hist[b]

    targets = {b for b, _, _ in lookup}
    probe = df.select(bucket.alias("__bucket"), v.alias("value")).filter(
        F.col("__bucket").isin(*targets)
    )
    rn = F.row_number().over(
        Window.partitionBy("__bucket").orderBy("value")
    )
    ranked = probe.withColumn("__rn", rn)
    look = spark.createDataFrame(
        lookup, "__bucket long, __rn int, q_ppm long"
    )
    return (
        ranked.join(F.broadcast(look), ["__bucket", "__rn"])
        .select("q_ppm", "value")
        .orderBy("q_ppm")
    )
