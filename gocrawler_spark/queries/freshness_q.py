r"""Freshness-driven recrawl scheduling.

The reference crawls each URL once (the seen-set is permanent,
crawler.go:454-460); a production crawler must also decide WHEN to
revisit. The standard model (Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003) treats each page as a
Poisson change process: estimate the change rate λ from observed
change history, then prioritize recrawl by expected staleness
λ × age-since-last-visit.

Here the observation log is the events table: each event carries a
page key `k` in its JSON props; successive events on the same page are
"visits", and a visit whose event_type differs from the previous
visit's is a "change". The cuckoo seen-set (`operators/cuckoo.py`)
already gives the frontier O(1) URL retirement — this query computes
what to retire: the λ·age ranking that feeds re-insertion.

Scale shape: one shuffle on k (window + aggregate share the
partitioning), a 1-row global-clock aggregate broadcast into the
result — O(pages) output, no driver data motion. At 1e10 URLs the
per-page history lives in the same domain-bucketed layout as the
frontier, so the window runs Exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register

_K_RX = '"k": (\\d+)'


@register(
    "recrawl_priority",
    f"""
WITH ev AS (
  SELECT event_id, ts, event_type,
         CAST(regexp_extract(props, '{_K_RX}', 1) AS BIGINT) AS k
  FROM events
),
obs AS (
  SELECT k, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY k ORDER BY ts, event_id) AS prev
  FROM ev
),
per AS (
  SELECT k,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> event_type
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         min(ts) AS first_ts, max(ts) AS last_ts
  FROM obs GROUP BY k
),
g AS (SELECT max(ts) AS now_ts FROM ev)
SELECT k, n_obs, n_changes,
       CAST(date_diff('microseconds', first_ts, last_ts) AS BIGINT) AS span_us,
       CAST(date_diff('microseconds', last_ts, g.now_ts) AS BIGINT) AS age_us,
       CAST(round(CAST(n_changes AS DOUBLE)
                  / date_diff('microseconds', first_ts, last_ts)
                  * date_diff('microseconds', last_ts, g.now_ts)
                  * 1e6) AS BIGINT) AS priority_micro
FROM per, g
WHERE n_obs >= 2
  AND date_diff('microseconds', first_ts, last_ts) > 0
ORDER BY k
""",
)
def recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """λ·age recrawl ranking: per page key k, change rate = observed
    event-type transitions over the observation span, staleness
    priority = n_changes / span_us * age_us (scaled 1e6)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.regexp_extract("props", _K_RX, 1).cast("long").alias("k"),
    )
    w = Window.partitionBy("k").orderBy("ts", "event_id")
    obs = ev.withColumn("prev", F.lag("event_type").over(w))
    per = obs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(
            F.when(
                F.col("prev").isNotNull()
                & (F.col("prev") != F.col("event_type")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    now = ev.agg(F.max("ts").alias("now_ts"))
    out = per.crossJoin(F.broadcast(now)).select(
        "k",
        "n_obs",
        "n_changes",
        F.expr("timestampdiff(MICROSECOND, first_ts, last_ts)")
        .cast("long")
        .alias("span_us"),
        F.expr("timestampdiff(MICROSECOND, last_ts, now_ts)")
        .cast("long")
        .alias("age_us"),
        F.round(
            F.col("n_changes").cast("double")
            / F.expr("timestampdiff(MICROSECOND, first_ts, last_ts)")
            * F.expr("timestampdiff(MICROSECOND, last_ts, now_ts)")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("priority_micro"),
    )
    return out.filter((F.col("n_obs") >= 2) & (F.col("span_us") > 0)).orderBy(
        "k"
    )
