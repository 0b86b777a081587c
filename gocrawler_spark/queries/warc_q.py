r"""WARC sink/source round-trip under the driver's oracle gate.

The write side can't be expressed in SQL, but a correct round-trip has
a closed form: documents are rendered as fetched payloads
(url = ``https://l{doc_id % 7}.example/d{doc_id}``, payload = the
UTF-8 document text, fetch_ts = ``2026-01-01 + (doc_id % 86400) s``),
sunk to WARC segments (sinks/warc.py), then read back through the
``binaryFile`` source with per-record sha1 block-digest verification.
A correct sink+source must conserve record count, every payload byte
(sum of octet lengths), every digest, the host set, and the max fetch
timestamp — which the oracle states directly over ``documents``.

Scale shape: write = one shuffle (groupBy segment) + sequential file
IO per task; read = parallel binaryFile scan; the aggregate is a
single partial-agg reduce. Payload bytes cross exactly two stages
(write shuffle, read scan) and never touch the driver.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register
from gocrawler_spark.sinks import warc as W

_EPOCH_20260101 = 1767225600


@register(
    "warc_roundtrip_stats",
    f"""
SELECT CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(*) AS BIGINT) AS n_digest_ok,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_payload_bytes,
       CAST(count(DISTINCT doc_id % 7) AS BIGINT) AS n_hosts,
       CAST({_EPOCH_20260101} + max(doc_id % 86400) AS BIGINT)
         AS max_fetch_ts
FROM documents
""",
)
def warc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://l"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/d"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.lit(_EPOCH_20260101) + F.col("doc_id") % 86400)
        .cast("long")
        .alias("fetch_ts"),
        F.lit("text/html").alias("content_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out_dir = tempfile.mkdtemp(prefix="warc_q_")
    # materialize the sink (manifest is O(segments) — a legitimate
    # driver action, no payload rows move)
    W.write_warc(docs, out_dir, n_segments=8).collect()
    back = W.read_warc(spark, out_dir)
    return back.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.when(F.col("digest_ok"), 1).otherwise(0)).alias(
            "n_digest_ok"
        ),
        F.sum(F.octet_length("payload")).alias("sum_payload_bytes"),
        F.countDistinct(
            F.regexp_extract("url", r"^https://(l\d+)\.example", 1)
        ).alias("n_hosts"),
        F.max("fetch_ts").alias("max_fetch_ts"),
    ).select(
        "n_records",
        "n_digest_ok",
        "sum_payload_bytes",
        "n_hosts",
        "max_fetch_ts",
    )
