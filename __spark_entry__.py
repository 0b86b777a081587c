"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query on /root/testdata/sf0.001 — the crawler
  corpus-frequency pipeline (analyze → groupBy token → reference
  total-order top-100), the heart of the reference's analytics
  (crawler.go:1282-1293).
- queries(): every implemented operator from SURVEY.md §2 + the
  training-data pipeline extensions (dedup/similarity/text-analysis),
  registered in gocrawler_spark/queries/.
- oracle_sql(): DuckDB-equivalent SQL for each query (same column
  names, integerized floats — see gocrawler_spark/queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gocrawler_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus term frequency, reference total order, top-100."""
    return QUERIES["corpus_freq_top100"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
