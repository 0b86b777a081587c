"""Structured Streaming under the driver's oracle gate.

The streaming layer (streaming/corpus_stream.py) was previously
unit-gated only; this module runs the REAL stream inside a registered
query so the driver's DuckDB value-hash compare covers it:

- the `documents` table is landed as N parquet files,
- a file-source stream (`maxFilesPerTrigger=1` → one MERGE commit per
  file) drives `merge_stream_into_corpus`'s foreachBatch upsert — the
  versioned write-new-state-then-swap-manifest commit used at scale,
- the final committed state's top-100 must hash-equal the one-shot
  batch aggregation (the corpus_freq_top100 oracle SQL).

This proves end-to-end that N incremental MERGE commits ≡ one batch
groupBy — the invariant the 100 TB incremental ingest path rests on
(reference analog: the accepted-doc fold at crawler.go:1061,1282).

Scale notes: each micro-batch shuffles only its delta (explode →
partial agg → merge against state partitioned on token); state size is
vocabulary-bounded, never corpus-bounded; commits are idempotent under
foreachBatch's at-least-once replay (manifest batch_id check, tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.operators import corpus as CO
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.crawler_q import AN_TOKS_CTE, CFG
from gocrawler_spark.streaming import corpus_stream as CS

# one micro-batch per landed file: >1 so cross-batch MERGE accumulation
# is actually exercised, small enough that the per-commit overhead stays
# negligible at driver-gate scale
N_BATCH_FILES = 4


def _fresh_scratch(name: str) -> str:
    """Fixed per-query scratch dir, cleared at query start (the
    returned frame reads the final state lazily, so cleanup-at-next-
    start is the invariant — same convention as queries/warc_q.py)."""
    d = os.path.join(tempfile.gettempdir(), f"gocrawler_spark_{name}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


@register(
    "streaming_corpus_top100",
    f"""
WITH {AN_TOKS_CTE}
SELECT token, count(*) AS cnt
FROM an_filtered
GROUP BY token
ORDER BY cnt DESC, token DESC
LIMIT 100
""",
)
def streaming_corpus_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 via Structured Streaming: N foreachBatch MERGE commits into
    the versioned corpus state, then the W1/W2 top-100 over the final
    committed state. Oracle = the plain batch aggregation — incremental
    ingest must be indistinguishable from a one-shot groupBy."""
    scratch = _fresh_scratch("stream_q")
    landing = os.path.join(scratch, "landing")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(state)

    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    (
        docs.select(
            F.col("doc_id").cast("string").alias("url"),
            F.col("text").alias("curated"),
            F.lit(None).cast("string").alias("signature"),
            F.lit(None).cast("timestamp").alias("accepted_at"),
        )
        .repartition(N_BATCH_FILES, "url")
        .write.mode("overwrite")
        .parquet(landing)
    )

    stream = (
        spark.readStream.schema(CS.ACCEPTED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    CS.merge_stream_into_corpus(stream, CFG, state, ckpt).awaitTermination()

    freq = CS.read_corpus_state(spark, state)
    return CO.top_k(
        freq.withColumnRenamed("count", "cnt").select("token", "cnt"), 100
    )
