r"""Structured Streaming ingest of WARC segments.

A crawl fleet lands WARC segment files (sinks/warc.py) as they close;
this module is the streaming consumer that parses, verifies, and
commits their records — the WARC twin of ``image_stream.ingest_images``
and the bridge from the durable fetch log to queryable tables:

- ``warc_segments_stream``: file-source stream over the landing
  directory through the ``binaryFile`` format (new ``*.warc[.gz]``
  file = one new segment; exactly-once per file via the checkpointed
  file index);
- ``parse``: ``sinks.warc.parse_segments`` applied to the stream —
  mapInPandas runs unchanged on streaming frames, one task per
  segment file, payload bytes never shuffle;
- ``ingest_warc``: foreachBatch commit — digest-verified records
  append as a versioned parquet dir per batch, digest-failed records
  quarantine beside them, one atomic manifest swap commits both.
  Idempotent under foreachBatch's at-least-once contract: the
  manifest records the last applied batch_id and a replayed batch
  (crash after the write, before the streaming checkpoint commit) is
  skipped — same pattern as ``corpus_stream.corpus_upsert`` /
  ``image_stream.image_upsert``.

Scale: per-batch work is one parse pass over the new segments + two
filtered appends; no shuffle. State growth is one parquet dir per
batch — a production deployment compacts old dirs the same way the
TableStore folds delta segments (plans/store.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.sinks import warc as W

_MANIFEST = "_warc_manifest.json"


#: binaryFile's fixed schema — streaming sources require it stated.
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def warc_segments_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", 4)
        .load(input_dir)
    )


def _read_manifest(state_path: str) -> dict | None:
    p = os.path.join(state_path, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_warc_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """All committed digest-verified records, or None before batch 0."""
    man = _read_manifest(state_path)
    if man is None or not man["dirs"]:
        return None
    return spark.read.parquet(*man["dirs"])


def read_warc_rejects(
    spark: SparkSession, state_path: str
) -> DataFrame | None:
    man = _read_manifest(state_path)
    if man is None or not man["reject_dirs"]:
        return None
    return spark.read.parquet(*man["reject_dirs"])


def warc_upsert(state_path: str):
    """The foreachBatch body for ingest_warc (exposed for replay
    testing)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        man = _read_manifest(state_path) or {
            "batch_id": -1,
            "dirs": [],
            "reject_dirs": [],
        }
        if batch_id <= man["batch_id"]:
            return  # replayed batch — already committed
        parsed = W.parse_segments(batch).persist()
        try:
            acc_dir = os.path.join(state_path, f"v{batch_id:09d}")
            rej_dir = os.path.join(state_path, f"rej{batch_id:09d}")
            accepted = parsed.filter(F.col("digest_ok")).drop("digest_ok")
            rejected = parsed.filter(~F.col("digest_ok")).drop("digest_ok")
            dirs = list(man["dirs"])
            rejs = list(man["reject_dirs"])
            # ONE bookkeeping action per micro-batch, not one per
            # split (the batch is persisted, but each count is still a
            # driver action round trip)
            row = parsed.agg(
                F.count(F.when(F.col("digest_ok"), 1)).alias("n_acc"),
                F.count(F.when(~F.col("digest_ok"), 1)).alias("n_rej"),
            ).first()
            if row["n_acc"]:
                accepted.write.mode("overwrite").parquet(acc_dir)
                dirs.append(acc_dir)
            if row["n_rej"]:
                rejected.write.mode("overwrite").parquet(rej_dir)
                rejs.append(rej_dir)
            tmp = os.path.join(state_path, "." + _MANIFEST + ".tmp")
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "batch_id": batch_id,
                        "dirs": dirs,
                        "reject_dirs": rejs,
                    },
                    f,
                )
            os.replace(tmp, os.path.join(state_path, _MANIFEST))  # commit
        finally:
            parsed.unpersist()

    return upsert


def ingest_warc(
    segments: DataFrame, state_path: str, checkpoint_dir: str
):
    """Parse-verify-commit the WARC segment stream into the versioned
    record table; returns the streaming query (availableNow trigger)."""
    os.makedirs(state_path, exist_ok=True)
    return (
        segments.writeStream.foreachBatch(warc_upsert(state_path))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
