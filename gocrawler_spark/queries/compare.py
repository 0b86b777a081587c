"""Local twin of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet tables and compare
row-count, column names, and an order-insensitive multiset of values.
Used by tests/test_queries_oracle.py so mismatches are caught before
the driver runs."""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "item"):  # numpy scalars
        return _norm(v.item())
    return v


def _rows(cols, records) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = (tuple(_norm(r[i]) for i in order) for r in records)
    # null-safe total order: None sorts before any value of any type
    return sorted(
        rows, key=lambda t: tuple((v is None, str(type(v)), v) for v in t)
    )


def compare(
    spark: SparkSession, sf_dir: str, fn, sql: str
) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    a = _rows(s_cols, s_rows)
    b = _rows(d_cols, d_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
