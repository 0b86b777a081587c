"""Local twin of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet tables and compare
row-count, column names, and an order-insensitive multiset of values.
Used by tests/test_queries_oracle.py so mismatches are caught before
the driver runs.

The value comparison is TYPE-SENSITIVE, exactly like the driver's
value hash: ``Decimal('3')``, ``3``, ``3.0`` and ``True`` are four
different values, and a float NaN is distinct from the string 'NaN'.
A tolerant (==, round-9) comparison here once false-passed the DuckDB
``SUM() -> decimal128`` leak that the driver's hash then failed — the
local gate must fail everything the real gate fails.
scripts/check_oracles.py builds its hash from this module's ``canon``
so the two replicas cannot drift.
"""

from __future__ import annotations

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


def canon(v: Any) -> str:
    """Driver-faithful canonical repr: type name + repr, so int vs
    Decimal vs float vs bool (and NaN vs 'NaN') never conflate."""
    if v is None:
        return "\x00null"
    if hasattr(v, "item"):  # numpy scalars
        v = v.item()
    return f"{type(v).__name__}:{v!r}"


def _rows(cols, records) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in records)


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
