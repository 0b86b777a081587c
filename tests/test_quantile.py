"""exact_quantiles must match DuckDB quantile_disc element-for-element
on arbitrary integer data, and must never put row-scale data through a
single-partition window."""

import random

import duckdb
from pyspark.sql import functions as F

from gocrawler_spark.operators.quantile import exact_quantiles

QS = (0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)


def _duck(values, qs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in values])
    out = {}
    for q in qs:
        out[int(round(q * 1_000_000))] = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t"
        ).fetchone()[0]
    con.close()
    return out


def _check(spark, values, n_buckets=16):
    df = spark.createDataFrame([(int(v),) for v in values], "v long")
    got = {
        r["q_ppm"]: r["value"]
        for r in exact_quantiles(df, "v", QS, n_buckets=n_buckets).collect()
    }
    assert got == _duck(values, QS)


def test_random_uniform(spark):
    rng = random.Random(11)
    _check(spark, [rng.randrange(-10_000, 10_000) for _ in range(801)])


def test_heavy_duplicates(spark):
    # zipf-ish: a few values dominate — range buckets concentrate
    rng = random.Random(23)
    vals = [rng.choice([3, 3, 3, 7, 7, 100, rng.randrange(0, 500)])
            for _ in range(900)]
    _check(spark, vals)


def test_clustered_extremes(spark):
    # nearly-empty middle: most buckets empty, two hold everything
    vals = list(range(40)) + [10_000_000 + k for k in range(37)]
    _check(spark, vals, n_buckets=64)


def test_all_equal_short_circuit(spark):
    _check(spark, [42] * 50)


def test_single_row(spark):
    _check(spark, [-7])


def test_empty_returns_empty(spark):
    df = spark.createDataFrame([], "v long")
    assert exact_quantiles(df, "v", QS).count() == 0


def test_fewer_rows_than_buckets(spark):
    _check(spark, [5, 1, 9], n_buckets=1024)


def test_no_unpartitioned_window_in_plan(spark):
    """Unlike prefix-sum (whose per-bucket offsets need one tiny global
    window), selection has NO global window at all: the only Window is
    partitioned by __bucket."""
    import re

    df = spark.range(5000).select((F.col("id") * 17 % 4001).alias("v"))
    plan = (
        exact_quantiles(df, "v", (0.5, 0.99), n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = re.findall(r"Window \[[^\]]*\], (\[[^\]]*\])", plan)
    assert windows, plan
    assert all("__bucket" in w for w in windows), plan
