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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.operators import corpus as CO
from gocrawler_spark.operators import images as IM
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.crawler_q import AN_TOKS_CTE, CFG, _SIG_SQL, _signatures
from gocrawler_spark.fixtures.image_phash import PHASH_VALUES_SQL
from gocrawler_spark.fixtures.image_probe import PROBE_VALUES_SQL
from gocrawler_spark.queries.image_q import (
    KEEP_PROBE_MILLI,
    N_DOCS,
    images_from_documents,
)
from gocrawler_spark.streaming import corpus_stream as CS
from gocrawler_spark.streaming import image_stream as IS

# one micro-batch per landed file: >1 so cross-batch MERGE accumulation
# is actually exercised, small enough that the per-commit overhead stays
# negligible at driver-gate scale
N_BATCH_FILES = 4


from gocrawler_spark.queries.warc_q import _fresh_scratch  # noqa: E402


def _land_defective_images(spark, sf_dir: str, landing: str) -> None:
    """Land the payload table into ``landing`` as N_BATCH_FILES parquet
    files with the deterministic defect injection every streaming-
    ingest oracle in this module assumes: every 13th id's payload is
    corrupted (decode must fail), and captions are rewritten to the
    id-derived reference (the crawl-source convention the stream
    validator checks, not the documents-derived one). ONE definition on
    purpose — three queries and their closed-form oracles share the
    13-modulus invariant, so the injection rule must not fork."""
    import pandas as pd

    imgs = images_from_documents(spark, sf_dir)

    def prep(batches):
        from gocrawler_spark.sources.synthetic_web import _sentence, h64

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.image_id)
                rows.append(
                    {
                        "image_id": r.image_id,
                        # corrupt every 13th payload: decode must fail
                        "bytes": b"\x00garbage"
                        if d % 13 == 0
                        else bytes(r.bytes),
                        "w": r.w,
                        "h": r.h,
                        "fmt": r.fmt,
                        "caption": _sentence(
                            h64(r.image_id, "cap", seed=42), 12, 4, 3
                        ),
                        "phash": r.phash,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                ],
            )

    (
        imgs.mapInPandas(prep, IM.IMAGE_SCHEMA)
        .repartition(N_BATCH_FILES, "image_id")
        .write.mode("overwrite")
        .parquet(landing)
    )


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


# ---------------------------------------------------------------------------
# Streaming image+caption ingest under the oracle gate: land the
# payload table as N files with two deterministic defect classes —
# corrupted payload bytes (every 13th id: decode must fail) and the
# near-dup twins (id % 5 == 1: stored pixels belong to the previous id,
# so the id→render pixel check must fail) — then run the real
# validate-and-commit stream (one commit per file) and count what the
# committed table accepted vs quarantined. The verdicts are invariants
# of the derivation, so the oracle states them closed-form.


@register(
    "streaming_image_ingest",
    f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
         (doc_id % 13 = 0) OR (doc_id % 5 = 1 AND doc_id > 0) AS rej
  FROM documents WHERE doc_id < {N_DOCS}
)
SELECT CAST(sum(CASE WHEN NOT rej THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accepted,
       CAST(sum(CASE WHEN NOT rej AND fmt = 'png' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_accepted_png,
       CAST(sum(CASE WHEN NOT rej AND fmt = 'qjpg' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_accepted_qjpg,
       CAST(sum(CASE WHEN rej THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
FROM base
""",
)
def streaming_image_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image_stream validate-and-commit path end to end: corrupted
    payloads and pixel-mismatched twins must land in the quarantine,
    everything else in the committed table, across N incremental
    foreachBatch commits (one per landed file)."""
    scratch = _fresh_scratch("stream_img_q")
    landing = os.path.join(scratch, "landing")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    _land_defective_images(spark, sf_dir, landing)

    stream = (
        spark.readStream.schema(IM.IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    IS.ingest_images(stream, state, ckpt).awaitTermination()

    acc = IS.read_images_state(spark, state)
    rej = IS.read_rejects(spark, state)
    sides = acc.select(F.lit("a").alias("side"), "fmt")
    if rej is not None:
        sides = sides.unionByName(rej.select(F.lit("r").alias("side"), "fmt"))
    return sides.agg(
        F.sum((F.col("side") == "a").cast("int"))
        .cast("bigint")
        .alias("n_accepted"),
        F.sum(((F.col("side") == "a") & (F.col("fmt") == "png")).cast("int"))
        .cast("bigint")
        .alias("n_accepted_png"),
        F.sum(((F.col("side") == "a") & (F.col("fmt") == "qjpg")).cast("int"))
        .cast("bigint")
        .alias("n_accepted_qjpg"),
        F.sum((F.col("side") == "r").cast("int"))
        .cast("bigint")
        .alias("n_rejected"),
    ).select("n_accepted", "n_accepted_png", "n_accepted_qjpg", "n_rejected")


# ---------------------------------------------------------------------------
# Streaming exact dedup WITH drop accounting under the oracle gate: the
# custom applyInPandasWithState operator (content_dedup_stream) runs as
# TWO sequential availableNow executions against one checkpoint — wave 0
# lands every en doc (url = doc_id), wave 1 lands mirror re-fetches of
# the doc_id % 7 == 3 docs (url = doc_id#m, same signature) — so the
# per-signature arrival counter provably survives a genuine stream
# restart. Each wave is repartitioned by signature, so a key's arrivals
# share a micro-batch and kept_url / report counts are closed-form:
#   kept_url    = min url among wave-0 arrivals (string order)
#   total_dups  = group_size - 1 + n_mirrors
#   n_reports   = 1 + (1 if the group has any mirror)


@register(
    "streaming_dedup_drops",
    f"""
WITH sigs AS ({_SIG_SQL}),
g AS (
  SELECT signature,
         min(CAST(doc_id AS VARCHAR)) AS kept_url,
         count(*) AS n0,
         sum(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS n_mir
  FROM sigs GROUP BY signature
)
SELECT signature, kept_url,
       CAST(n0 - 1 + n_mir AS BIGINT) AS total_dups,
       CAST(1 + CASE WHEN n_mir > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_reports
FROM g
""",
)
def streaming_dedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """content_dedup_stream end to end: first-ever arrival per P5
    signature is admitted (lowest url), every batch's dup pressure is
    reported, and the state store carries the arrival counts across a
    stop/restart boundary (run 2 sees run 1's keys as already-admitted)."""
    scratch = _fresh_scratch("stream_dedup_q")
    landing = os.path.join(scratch, "landing")
    sink = os.path.join(scratch, "sink")
    ckpt = os.path.join(scratch, "ckpt")

    sigs = _signatures(spark, sf_dir)

    def land(df: DataFrame, mode: str) -> None:
        (
            df.select(
                "url",
                F.lit(None).cast("string").alias("curated"),
                "signature",
                F.lit(None).cast("timestamp").alias("accepted_at"),
            )
            .repartition(N_BATCH_FILES, "signature")
            .write.mode(mode)
            .parquet(landing)
        )

    def run_stream() -> None:
        stream = (
            spark.readStream.schema(CS.ACCEPTED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        (
            CS.content_dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    land(sigs.select(F.col("doc_id").cast("string").alias("url"), "signature"), "overwrite")
    run_stream()  # wave 0: every doc is a first arrival of its group
    land(
        sigs.filter(F.col("doc_id") % 7 == 3).select(
            F.concat(F.col("doc_id").cast("string"), F.lit("#m")).alias("url"),
            "signature",
        ),
        "append",
    )
    run_stream()  # wave 1: mirrors hit restored state — all are dups

    out = spark.read.parquet(sink)
    return out.groupBy("signature").agg(
        F.min("kept_url").alias("kept_url"),
        F.sum("new_dups").cast("bigint").alias("total_dups"),
        F.count("*").cast("bigint").alias("n_reports"),
    )


# ---------------------------------------------------------------------------
# Score-on-ingest under the oracle gate: same landing construction as
# streaming_image_ingest (corrupted 13ths + pixel-mismatched twins
# quarantine), but the stream commits inference scores for every
# accepted row in the SAME manifest swap. Accepted pixels are the
# native render of their id, so the pinned probe fixture states each
# committed score closed-form.


@register(
    "streaming_scored_ingest",
    f"""
WITH base AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
         f.score_milli
  FROM documents d
  JOIN (VALUES {PROBE_VALUES_SQL}) f(did, score_milli)
    ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
    AND d.doc_id % 13 <> 0
    AND NOT (d.doc_id % 5 = 1 AND d.doc_id > 0)
)
SELECT fmt,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN score_milli >= {KEEP_PROBE_MILLI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli
FROM base GROUP BY fmt ORDER BY fmt
""",
)
def streaming_scored_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-on-ingest end to end: N foreachBatch commits, each
    validating its file's payloads AND inference-scoring the accepted
    rows while they are hot (streaming/image_stream.py score=True),
    one manifest swap per batch covering both tables. The committed
    score table must contain exactly the accepted rows with the
    fixture-pinned probe scores — quarantined rows (corrupt payloads,
    pixel-mismatched twins) must never be scored."""
    scratch = _fresh_scratch("stream_scored_q")
    landing = os.path.join(scratch, "landing")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    _land_defective_images(spark, sf_dir, landing)

    stream = (
        spark.readStream.schema(IM.IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    IS.ingest_images(stream, state, ckpt, score=True).awaitTermination()

    scores = IS.read_scores_state(spark, state)
    return (
        scores.withColumn(
            "fmt",
            F.when(F.col("image_id").cast("long") % 3 == 0, "qjpg").otherwise(
                "png"
            ),
        )
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_scored"),
            F.sum(
                (F.col("score_milli") >= KEEP_PROBE_MILLI).cast("long")
            ).alias("n_keep"),
            F.sum("score_milli").alias("sum_score_milli"),
        )
        .orderBy("fmt")
    )


# ---------------------------------------------------------------------------
# Small-files compaction under the oracle gate: ingest the same landing
# as streaming_image_ingest (per-batch fragment dirs), compact the
# accepted state into the bucketed payload store, and prove nothing was
# lost or invented — row count, id sum, and phash sum all conserved,
# with phash stated from the pinned fixture.


@register(
    "image_compaction_stats",
    f"""
WITH base AS (
  SELECT d.doc_id, f.phash
  FROM documents d
  JOIN (VALUES {PHASH_VALUES_SQL}) f(did, phash) ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
    AND d.doc_id % 13 <> 0
    AND NOT (d.doc_id % 5 = 1 AND d.doc_id > 0)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_stream,
       CAST(COUNT(*) AS BIGINT) AS n_compacted,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(phash % 1000000000000) AS BIGINT) AS sum_phash_mod
FROM base
""",
)
def image_compaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming small-files problem, closed: ingest lands one
    fragment dir per micro-batch (that's what makes its commit
    idempotent), then compact_into_store rewrites the accepted state
    into the bucketed payload store — one shuffle, n_buckets files,
    and every enrichment join afterwards is shuffle-free. Conservation
    is proven three ways (row count, id sum, fixture-pinned phash sum
    mod 1e12); the file-count drop itself is asserted in
    tests/test_image_stream.py where it's deterministic."""
    from gocrawler_spark.plans import image_store as IST

    scratch = _fresh_scratch("stream_compact_q")
    landing = os.path.join(scratch, "landing")
    state = os.path.join(scratch, "state")
    ckpt = os.path.join(scratch, "ckpt")
    _land_defective_images(spark, sf_dir, landing)
    stream = (
        spark.readStream.schema(IM.IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    IS.ingest_images(stream, state, ckpt).awaitTermination()

    store = IST.ImageStore(spark, name="q_compact_store", n_buckets=8)
    compacted = IS.compact_into_store(spark, state, store)
    acc = IS.read_images_state(spark, state)

    def side_stats(df, n_name):
        return df.agg(
            F.count("*").alias(n_name),
            F.sum(F.col("image_id").cast("long")).alias("sum_ids"),
            F.sum(F.col("phash") % F.lit(1_000_000_000_000)).alias(
                "sum_phash_mod"
            ),
        )

    a = side_stats(acc, "n_stream")
    c = side_stats(compacted, "n_compacted").withColumnRenamed(
        "sum_ids", "sum_ids_c"
    ).withColumnRenamed("sum_phash_mod", "sum_phash_mod_c")
    out = a.crossJoin(c)
    # conservation enforced in-plan: mismatches surface as NULLs that
    # break the oracle compare, not silently-equal aggregates
    return out.select(
        "n_stream",
        "n_compacted",
        F.when(F.col("sum_ids") == F.col("sum_ids_c"), F.col("sum_ids")).alias(
            "sum_ids"
        ),
        F.when(
            F.col("sum_phash_mod") == F.col("sum_phash_mod_c"),
            F.col("sum_phash_mod"),
        ).alias("sum_phash_mod"),
    )
