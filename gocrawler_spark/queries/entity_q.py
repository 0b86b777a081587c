r"""T16 (inventory completeness): entity-frequency extraction — the
reference's commented-out `prose` block (crawler.go:1347-1361: NER
over the curated corpus → ``entityFreq[text + " :: " + label]++`` →
rSortFreq → print until the counter passes 30, i.e. 32 rows).

The prose NER model has no bit-exact twin (same class of deviation as
whatlanggo, SURVEY.md §7.3); what this operator keeps is the dead
code's SHAPE — span extraction → ``text :: label`` keying → corpus
frequency → W1 total order → the 32-row bound — with a deterministic
rule-based recognizer: an entity is a maximal run of ≥2 consecutive
title-cased tokens. Because the driver corpus is all-lowercase, the
title-casing itself is synthesized by a deterministic position rule
(``((doc_id*31 + i) // 3) % 5 == 0``, giving 3-token cased blocks
every 15 positions) so the recognizer has real runs to find and the
DuckDB oracle can restate every step exactly.

Scale shape: explode → one doc-local window (runs found by the
classic ``i - row_number`` gap-and-island trick, partitioned by doc —
no global window) → groupBy(entity) with map-side combine →
TakeOrderedAndProject. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register

_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'),"
    " x -> x <> '')"
)


@register(
    "entity_freq_top32",
    f"""
WITH toklists AS (
  SELECT doc_id, {_TOKS} AS L FROM documents WHERE lang = 'en'
),
toks AS (
  SELECT doc_id, unnest(range(len(L))) AS i, L
  FROM toklists WHERE len(L) > 0
),
cased AS (
  SELECT doc_id, i, L[i + 1] AS token
  FROM toks
  WHERE ((doc_id * 31 + i) // 3) % 5 = 0
),
runs AS (
  SELECT doc_id, i, token,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM cased
),
spans AS (
  SELECT doc_id, grp,
         string_agg(upper(token[1]) || token[2:], ' ' ORDER BY i)
           AS span,
         count(*) AS n_toks
  FROM runs GROUP BY doc_id, grp
)
SELECT span || ' :: ENT' AS entity, CAST(count(*) AS BIGINT) AS cnt
FROM spans WHERE n_toks >= 2
GROUP BY span
ORDER BY cnt DESC, entity DESC
LIMIT 32
""",
)
def entity_freq_top32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity frequencies in the reference's dead-code shape: runs of
    ≥2 consecutive (rule-)cased tokens, keyed ``span :: ENT``, W1
    total order, 32 rows (the crawler.go:1356-1360 print bound)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower("text"), r"[^\p{L}\p{N}]+"),
                lambda x: x != "",
            )
        ).alias("i", "token"),
    )
    cased = toks.filter(
        F.expr("pmod(div(doc_id * 31 + i, 3), 5) = 0")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = cased.withColumn("grp", F.col("i") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("i", "token")))
                .getField("token")
            ).alias("span_lower"),
            F.count(F.lit(1)).alias("n_toks"),
        )
        .filter(F.col("n_toks") >= 2)
    )
    ent = F.concat(
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("span_lower"), " "), lambda t: F.initcap(t)
            ),
        ),
        F.lit(" :: ENT"),
    )
    return (
        spans.select(ent.alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.desc("entity"))
        .limit(32)
    )
