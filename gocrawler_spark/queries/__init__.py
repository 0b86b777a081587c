"""Query registry for the driver's correctness gate.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) is exposed twice:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path),
- an equivalent ANSI-SQL string runnable by DuckDB on the same parquet
  tables (the oracle path).

Conventions that keep the driver's order-insensitive value-hash
comparison exact:
- every computed column is aliased identically on both sides;
- float results are emitted as ``*_micro`` BIGINT (round(x*1e6)) —
  double arithmetic is kept identical on both sides (IEEE ops in the
  same order) and integerized before hashing;
- sums of doubles are computed as sums of pre-rounded BIGINTs
  (order-independent), never as float SUM (which is
  association-order-dependent and differs across engines);
- top-k queries use a deterministic total order (count desc, key desc
  — the reference's rSortFreq order, crawler.go:705-718).

DuckDB pitfalls that have bitten (cast explicitly in oracle SQL):
- VALUES integer literals bind as INT32 — products overflow; CAST the
  unpivoted value to BIGINT before any multiplication;
- SUM() returns HUGEINT/decimal128 — CAST to BIGINT at every output
  AND before feeding range()/generate_series (range(HUGEINT) fails);
- window SUM feeding integer division: CAST the cumsum to BIGINT;
- int*int literals in SELECT (e.g. alpha*m*m) stay INT32 — write
  float literals when the product exceeds 2^31;
- Spark parquet timestamps are TIMESTAMP_NTZ: unix_micros() rejects
  them — use timestampdiff(MICROSECOND, ...) / DuckDB
  date_diff('microseconds', ...) for exact integer gaps.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle_sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle_sql is not None:
            ORACLES[name] = oracle_sql
        return fn

    return deco


# Session-scoped result materialization for expensive queries with
# SMALL outputs that other queries consume (the curation funnel reads
# the dedup-cluster, contamination, and quality gate relations; the
# cluster query reads the Jaccard pairs). This is the in-session analog
# of how a 100 TB pipeline actually runs: each gate is materialized as
# a table once and every downstream join reads the table, not the
# recomputed lineage. Keyed by (SparkContext, sf_dir); blocks are tiny
# (see each decorated query) and freed when the context dies.
_RESULT_MEMO: dict = {}


def memo_result(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (spark.sparkContext.applicationId, sf_dir, fn.__name__)
        df = _RESULT_MEMO.get(key)
        if df is None:
            df = fn(spark, sf_dir).localCheckpoint(eager=True)
            _RESULT_MEMO[key] = df
        return df

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn  # plan tests inspect the unmaterialized plan
    return wrapped


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# import for registration side effects
from gocrawler_spark.queries import crawler_q  # noqa: E402,F401
from gocrawler_spark.queries import dedup_q  # noqa: E402,F401
from gocrawler_spark.queries import filter_q  # noqa: E402,F401
from gocrawler_spark.queries import freshness_q  # noqa: E402,F401
from gocrawler_spark.queries import funnel_q  # noqa: E402,F401
from gocrawler_spark.queries import graph_q  # noqa: E402,F401
from gocrawler_spark.queries import html_q  # noqa: E402,F401
from gocrawler_spark.queries import image_pipeline_q  # noqa: E402,F401
from gocrawler_spark.queries import image_q  # noqa: E402,F401
from gocrawler_spark.queries import anchor_q  # noqa: E402,F401
from gocrawler_spark.queries import budget_q  # noqa: E402,F401
from gocrawler_spark.queries import media_q  # noqa: E402,F401
from gocrawler_spark.queries import mm_q  # noqa: E402,F401
from gocrawler_spark.queries import ngram_q  # noqa: E402,F401
from gocrawler_spark.queries import pipeline_q  # noqa: E402,F401
from gocrawler_spark.queries import provenance_q  # noqa: E402,F401
from gocrawler_spark.queries import rel_q  # noqa: E402,F401
from gocrawler_spark.queries import robots_q  # noqa: E402,F401
from gocrawler_spark.queries import search_q  # noqa: E402,F401
from gocrawler_spark.queries import semdedup_q  # noqa: E402,F401
from gocrawler_spark.queries import sitemap_q  # noqa: E402,F401
from gocrawler_spark.queries import sketch_q  # noqa: E402,F401
from gocrawler_spark.queries import stem_q  # noqa: E402,F401
from gocrawler_spark.queries import stream_q  # noqa: E402,F401
from gocrawler_spark.queries import trap_q  # noqa: E402,F401
from gocrawler_spark.queries import warc_q  # noqa: E402,F401
from gocrawler_spark.queries import text_q  # noqa: E402,F401
