r"""Count-Min-Sketch heavy hitters under the driver's oracle gate.

The reference keeps its corpus term frequencies as one exact in-memory
map (``corpusFreqs``, crawler.go:1061,1282) — fine at one process,
impossible at 100 TB where the multilingual/noise vocabulary is 1e9+
types. The Count-Min Sketch (Cormode & Muthukrishnan 2005) is the
standard bounded-state substitute: ``d`` hash rows × ``w`` counters,
point estimate = min over rows, one-sided error (only OVERcounts,
bounded by 2N/w with prob 1-2^-d). Its killer property for Spark is
mergeability: per-partition sketches sum cell-wise, so corpus-scale
heavy hitters cost d·w int64s of state per task, not a vocabulary
shuffle — the same partial-agg shape as the HLL sketch
(queries/text_q.py).

Everything is integer arithmetic stated identically in both engines:
row hashes are disjoint 32-bit words of ``md5(token)`` mod ``w``, cell
values are int64 sums of exact token counts, the estimate is an int64
min — so the oracle checks the sketch itself, cell math and all, not
a tolerance band.

Scale shape: one explode of (token,count) into d=(row,cell) pairs +
one (row,cell) partial-agg shuffle bounded by d·w = 1024 cells
regardless of corpus size; the probe joins the top-k exact tokens
(≤ 32 rows, broadcast) against those 1024 cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.queries import register
from gocrawler_spark.queries.crawler_q import AN_TOKS_CTE, _en_token_freq

CMS_D = 4  # hash rows (md5 yields four disjoint 32-bit words)
CMS_W = 256  # counters per row
TOP_K = 32


def _cms_oracle() -> str:
    h_cols = ",\n        ".join(
        f"CAST(('0x' || substr(md5(token), {1 + 8 * i}, 8)) AS BIGINT) "
        f"% {CMS_W} AS h{i}"
        for i in range(CMS_D)
    )
    unpivot_cells = " UNION ALL ".join(
        f"SELECT {i} AS r, h{i} AS c, cnt FROM h" for i in range(CMS_D)
    )
    unpivot_probe = " UNION ALL ".join(
        f"SELECT token, cnt, {i} AS r, h{i} AS c FROM topk"
        for i in range(CMS_D)
    )
    return f"""
WITH {AN_TOKS_CTE},
freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM an_filtered GROUP BY token
),
h AS (SELECT token, cnt,
        {h_cols}
      FROM freq),
cells AS (
  SELECT r, c, CAST(sum(cnt) AS BIGINT) AS cell
  FROM ({unpivot_cells}) GROUP BY r, c
),
topk AS (SELECT * FROM h ORDER BY cnt DESC, token DESC LIMIT {TOP_K})
SELECT p.token, p.cnt AS exact_cnt,
       CAST(min(cl.cell) AS BIGINT) AS est_cms,
       CAST(min(cl.cell) - p.cnt AS BIGINT) AS overcount
FROM ({unpivot_probe}) p
JOIN cells cl ON cl.r = p.r AND cl.c = p.c
GROUP BY p.token, p.cnt
ORDER BY exact_cnt DESC, token DESC
"""


@register("cms_heavy_hitters", _cms_oracle())
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a d=4 × w=256 Count-Min Sketch over the full analyzed
    token stream, then probe it with the top-32 exact heavy hitters:
    emits (token, exact_cnt, est_cms, overcount). CMS guarantees
    overcount >= 0; the oracle replays the identical integer sketch.

    The (r,c) groupBy IS the sketch merge — in a streaming or
    multi-shard deployment each task emits its local 1024 cells and
    this same sum combines them."""
    freq = _en_token_freq(spark, sf_dir)
    tf = freq.select(
        "token",
        F.col("count").cast("long").alias("cnt"),
        *[
            (
                F.conv(F.substring(F.md5("token"), 1 + 8 * i, 8), 16, 10)
                .cast("long")
                % CMS_W
            ).alias(f"h{i}")
            for i in range(CMS_D)
        ],
    )
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("r"),
                    F.col(f"h{i}").alias("c"),
                )
                for i in range(CMS_D)
            ]
        )
    ).alias("rc")
    cells = (
        tf.select("cnt", rc)
        .select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"), "cnt")
        .groupBy("r", "c")
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    topk = tf.orderBy(F.desc("cnt"), F.desc("token")).limit(TOP_K)
    probe = topk.select("token", "cnt", rc).select(
        "token", "cnt", F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    )
    return (
        F.broadcast(probe)
        .join(cells, ["r", "c"])
        .groupBy("token", "cnt")
        .agg(F.min("cell").cast("long").alias("est_cms"))
        .select(
            "token",
            F.col("cnt").alias("exact_cnt"),
            "est_cms",
            (F.col("est_cms") - F.col("cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), F.desc("token"))
    )
