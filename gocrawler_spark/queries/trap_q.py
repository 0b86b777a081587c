r"""Crawl-trap detection under the driver's oracle gate.

Synthesizes a deterministic URL population from ``doc_id`` (six
shapes: clean two-level paths, self-similar deep trees, calendar
pagination, session-id mints, faceted param explosions, clean
param'd pages — the canonical trap taxonomy, Heydon & Najork WWW'99),
then scores every URL with the lexical trap features of
functions/traps.py and aggregates per host: the demotion table a
frontier consults before admitting a host's discovered links.

The Spark side detects with column expressions (split /
array_distinct / regexp), the oracle restates the same features in
DuckDB list/regex algebra; both score with identical integer votes —
self-similar trees (+3), year segments (+3), session ids (+3), depth
≥ 8 (+2), ≥ 5 params (+1); trap = score ≥ 3.

Scale shape: scan → per-row codegen expressions → one groupBy(host)
with map-side combine; output is O(hosts). The features never leave
the row until the tiny aggregate, so this runs inside the fetch wave's
existing link-extraction pass at zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions.traps import (
    CAL_RX,
    DEPTH_TRAP,
    PARAM_TRAP,
    REPEAT_TRAP,
    SESSION_RX,
    trap_features,
)
from gocrawler_spark.queries import load, register


def synth_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL population over doc_id (pure arithmetic)."""
    d = F.col("doc_id")

    def s(c):
        return c.cast("string")

    url = (
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit("https://site"), s(d % 20), F.lit(".example/a"),
                s(d), F.lit("/b"), s(d),
            ),
        )
        .when(
            d % 6 == 1,
            F.concat(
                F.lit("https://deep"), s(d % 5), F.lit(".example"),
                F.expr(
                    "repeat(concat('/p', cast(doc_id % 7 as string)),"
                    " cast(3 + doc_id % 14 as int))"
                ),
            ),
        )
        .when(
            d % 6 == 2,
            F.concat(
                F.lit("https://cal"), s(d % 5), F.lit(".example/cal/2024/"),
                s(1 + d % 12), F.lit("/"), s(1 + d % 28),
                F.lit("?next="), s(d),
            ),
        )
        .when(
            d % 6 == 3,
            F.concat(
                F.lit("https://shop"), s(d % 10), F.lit(".example/item/"),
                s(d), F.lit("?sessionid="),
                F.substring(F.md5(s(d)), 1, 16),
            ),
        )
        .when(
            d % 6 == 4,
            F.concat(
                F.lit("https://f"), s(d % 5), F.lit(".example/s?q=1"),
                F.expr("repeat('&p=2', cast(2 + doc_id % 8 as int))"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://n"), s(d % 10), F.lit(".example/page-"),
                s(d), F.lit("?ref=home"),
            )
        )
    )
    return docs.select(d.alias("d"), url.alias("url"))


_URLS_CTE = """
u AS (
  SELECT doc_id AS d,
    CASE doc_id % 6
      WHEN 0 THEN 'https://site' || (doc_id % 20) || '.example/a'
                  || doc_id || '/b' || doc_id
      WHEN 1 THEN 'https://deep' || (doc_id % 5) || '.example'
                  || repeat('/p' || (doc_id % 7),
                            CAST(3 + doc_id % 14 AS INT))
      WHEN 2 THEN 'https://cal' || (doc_id % 5) || '.example/cal/2024/'
                  || (1 + doc_id % 12) || '/' || (1 + doc_id % 28)
                  || '?next=' || doc_id
      WHEN 3 THEN 'https://shop' || (doc_id % 10) || '.example/item/'
                  || doc_id || '?sessionid='
                  || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
      WHEN 4 THEN 'https://f' || (doc_id % 5) || '.example/s?q=1'
                  || repeat('&p=2', CAST(2 + doc_id % 8 AS INT))
      ELSE 'https://n' || (doc_id % 10) || '.example/page-'
           || doc_id || '?ref=home'
    END AS url
  FROM documents
)"""


@register(
    "url_trap_scores",
    f"""
WITH {_URLS_CTE},
parts AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         list_filter(
           string_split(regexp_extract(url, '^https?://[^/]+([^?]*)', 1),
                        '/'),
           seg -> seg <> '') AS segs,
         regexp_extract(url, '\\?(.*)$', 1) AS q
  FROM u
),
feat AS (
  SELECT host,
         CAST(len(segs) AS BIGINT) AS depth,
         CAST(len(segs) - len(list_distinct(segs)) AS BIGINT) AS n_repeats,
         CAST(CASE WHEN q = '' THEN 0
                   ELSE len(string_split(q, '&')) END AS BIGINT) AS n_params,
         CASE WHEN regexp_matches(q, '{SESSION_RX}') THEN 1 ELSE 0
           END AS has_session,
         CASE WHEN regexp_matches('/' || array_to_string(segs, '/'),
                                  '{CAL_RX}') THEN 1 ELSE 0
           END AS has_calendar
  FROM parts
),
scored AS (
  SELECT host, depth,
         (CASE WHEN depth >= {DEPTH_TRAP} THEN 2 ELSE 0 END
          + CASE WHEN n_repeats >= {REPEAT_TRAP} THEN 3 ELSE 0 END
          + CASE WHEN n_params >= {PARAM_TRAP} THEN 1 ELSE 0 END
          + has_session * 3 + has_calendar * 3) AS score
  FROM feat
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN score >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_traps,
       CAST(sum(CASE WHEN score >= 3 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS trap_ratio_micro,
       CAST(max(score) AS BIGINT) AS max_score,
       CAST(sum(depth) AS BIGINT) AS sum_depth
FROM scored GROUP BY host ORDER BY host
""",
)
def url_trap_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score six deterministic URL shapes with the lexical crawl-trap
    detector and emit the per-host demotion table (trap counts and
    ratio) the frontier's priority function divides by."""
    urls = synth_urls(load(spark, sf_dir, "documents"))
    ft = trap_features(F.col("url"))
    scored = urls.select(
        ft["host"].alias("host"),
        ft["depth"].alias("depth"),
        ft["trap_score"].alias("score"),
        ft["is_trap"].alias("is_trap"),
    )
    return (
        scored.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("is_trap").cast("long").alias("n_traps"),
            F.expr("sum(is_trap) * 1000000 div count(*)")
            .cast("long")
            .alias("trap_ratio_micro"),
            F.max("score").cast("long").alias("max_score"),
            F.sum("depth").cast("long").alias("sum_depth"),
        )
        .orderBy("host")
    )
