"""The curation funnel: one per-document keep/drop verdict combining
every gate a pre-training data pipeline runs, in precedence order:

1. benchmark holdout — docs from the benchmark source never train;
2. exact dedup — only the first doc (min doc_id) per normalized-text
   md5 survives (the reference's P5 "first wins", crawler.go:1248-1255,
   at the whole-doc level);
3. near-dup clusters — transitive closure over Jaccard pairs +
   signature groups (dedup_clusters); only the cluster canonical
   (min doc_id) survives;
4. decontamination — any distinct analyzer shingle shared with the
   benchmark source flags the doc (decontaminate_overlap);
5. quality — the Gopher rule verdict (gopher_quality_filter).

``drop_reason`` is the FIRST failing gate in that order (empty string
for keepers), so the funnel stage counts are a trivial group-by over
this one relation. Every flag is an integer decided on pre-rounded
values, so the verdict is engine-exact (see queries/__init__ header).

Scale: the verdict is a left-join spine over the component relations —
each component is itself candidate-bounded / partial-aggregated (see
their docstrings); the spine joins are all on doc_id (one shuffle
each, or zero where broadcastable). This is the table you'd actually
materialize at 100 TB: downstream training jobs filter keep=1 and
auditors group by drop_reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.functions import text as TX
from gocrawler_spark.queries import ORACLES, QUERIES, load, register
from gocrawler_spark.queries.crawler_q import CFG, STOP_RX, TOKS_SQL
from gocrawler_spark.queries.pipeline_q import _BENCH_SOURCE


@register(
    "curation_verdict",
    f"""
WITH norm AS (
  SELECT doc_id,
         md5(array_to_string(
             list_filter({TOKS_SQL}, t -> NOT regexp_matches(t, '{STOP_RX}')),
             ' ')) AS norm_key
  FROM documents
),
exact AS (
  SELECT doc_id,
         CAST(doc_id <> min(doc_id) OVER (PARTITION BY norm_key) AS BIGINT)
           AS is_exact_dup
  FROM norm
),
clusters AS (SELECT * FROM ({ORACLES['dedup_clusters']}) c),
contam AS (SELECT * FROM ({ORACLES['decontaminate_overlap']}) d),
quality AS (SELECT doc_id, keep FROM ({ORACLES['gopher_quality_filter']}) q)
SELECT d.doc_id,
       CAST(d.source = '{_BENCH_SOURCE}' AS BIGINT) AS is_benchmark,
       e.is_exact_dup,
       CAST(COALESCE(c.is_canonical, 1) = 0 AS BIGINT) AS is_near_dup,
       CAST(COALESCE(x.contaminated, 0) AS BIGINT) AS contaminated,
       CAST(q.keep = 0 AS BIGINT) AS low_quality,
       CAST(d.source <> '{_BENCH_SOURCE}'
            AND e.is_exact_dup = 0
            AND COALESCE(c.is_canonical, 1) = 1
            AND COALESCE(x.contaminated, 0) = 0
            AND q.keep = 1 AS BIGINT) AS keep,
       CASE
         WHEN d.source = '{_BENCH_SOURCE}' THEN 'benchmark'
         WHEN e.is_exact_dup = 1 THEN 'exact_dup'
         WHEN COALESCE(c.is_canonical, 1) = 0 THEN 'near_dup'
         WHEN COALESCE(x.contaminated, 0) = 1 THEN 'contaminated'
         WHEN q.keep = 0 THEN 'low_quality'
         ELSE ''
       END AS drop_reason
FROM documents d
JOIN exact e USING (doc_id)
JOIN quality q USING (doc_id)
LEFT JOIN clusters c USING (doc_id)
LEFT JOIN contam x USING (doc_id)
""",
)
def curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdict over the full gate stack; see the
    module docstring for the precedence order and scale shape."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    norm_key = F.md5(F.array_join(TX.analyzed_tokens(F.col("text"), CFG), " "))
    exact = (
        load(spark, sf_dir, "documents")
        .select("doc_id", norm_key.alias("norm_key"))
        .select(
            "doc_id",
            (
                F.col("doc_id")
                != F.min("doc_id").over(Window.partitionBy("norm_key"))
            )
            .cast("bigint")
            .alias("is_exact_dup"),
        )
    )
    clusters = QUERIES["dedup_clusters"](spark, sf_dir).select(
        "doc_id", "is_canonical"
    )
    contam = QUERIES["decontaminate_overlap"](spark, sf_dir).select(
        "doc_id", "contaminated"
    )
    quality = QUERIES["gopher_quality_filter"](spark, sf_dir).select(
        "doc_id", "keep"
    )
    is_benchmark = (F.col("source") == _BENCH_SOURCE).cast("bigint")
    j = (
        docs.join(exact, "doc_id")
        .join(quality.withColumnRenamed("keep", "q_keep"), "doc_id")
        .join(clusters, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    is_near = (F.coalesce(F.col("is_canonical"), F.lit(1)) == 0).cast("bigint")
    cont = F.coalesce(F.col("contaminated"), F.lit(0)).cast("bigint")
    low_q = (F.col("q_keep") == 0).cast("bigint")
    keep = (
        (F.col("source") != _BENCH_SOURCE)
        & (F.col("is_exact_dup") == 0)
        & (F.coalesce(F.col("is_canonical"), F.lit(1)) == 1)
        & (cont == 0)
        & (F.col("q_keep") == 1)
    ).cast("bigint")
    reason = (
        F.when(F.col("source") == _BENCH_SOURCE, "benchmark")
        .when(F.col("is_exact_dup") == 1, "exact_dup")
        .when(is_near == 1, "near_dup")
        .when(cont == 1, "contaminated")
        .when(low_q == 1, "low_quality")
        .otherwise("")
    )
    return j.select(
        "doc_id",
        is_benchmark.alias("is_benchmark"),
        "is_exact_dup",
        is_near.alias("is_near_dup"),
        cont.alias("contaminated"),
        low_q.alias("low_quality"),
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )
