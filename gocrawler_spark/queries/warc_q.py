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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, register
from gocrawler_spark.sinks import warc as W

_EPOCH_20260101 = 1767225600


def _fresh_scratch(name: str) -> str:
    """A per-query scratch dir that does NOT leak across runs: the
    previous run's dir (fixed path per query name) is removed before
    the new one is created. The returned frame reads these files
    lazily, so in-run cleanup is impossible — cleanup-at-next-start is
    the invariant instead (queries run serially in the driver/bench).
    """
    d = os.path.join(tempfile.gettempdir(), f"gocrawler_spark_{name}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


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
    docs = _docs_as_payloads(spark, sf_dir)
    out_dir = _fresh_scratch("warc_q")
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


def _docs_as_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
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


@register(
    "warc_cdx_lookup_stats",
    """
SELECT CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(count(*) AS BIGINT) AS n_fetched_ok,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_payload_bytes
FROM documents WHERE doc_id % 29 = 0
""",
)
def warc_cdx_lookup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level random access through the CDX-style index: sink
    the documents as WARC segments, read the index back, sample every
    29th doc, seek+read EACH sampled record by its (file, offset,
    length) span, and re-verify its block digest. A correct index +
    writer must fetch every sampled payload intact — the oracle states
    the sample's closed form.

    Scale shape: the index scan prunes to the sample BEFORE any IO
    (predicate on the index parquet), then one mapInPandas pass does
    O(sample) random reads — never a segment scan; this is the
    serve-one-page path at 100 TB.
    """
    from gocrawler_spark.sinks.warc import block_digest

    out_dir = _fresh_scratch("warc_cdx_q")
    W.write_warc(_docs_as_payloads(spark, sf_dir), out_dir).collect()
    idx = W.read_cdx(spark, out_dir)
    sample = idx.filter(
        F.regexp_extract("url", r"/d(\d+)$", 1).cast("long") % 29 == 0
    )

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            oks, lens = [], []
            for r in pdf.itertuples(index=False):
                headers, payload = W.fetch_record(
                    out_dir, str(r.file), int(r.offset), int(r.rlen)
                )
                good = (
                    headers.get("warc-target-uri") == str(r.url)
                    and headers.get("warc-block-digest")
                    == block_digest(payload)
                )
                oks.append(int(good))
                lens.append(len(payload))
            yield pd.DataFrame({"ok": oks, "plen": lens})

    probed = sample.mapInPandas(probe, "ok long, plen long")
    return probed.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("ok").alias("n_fetched_ok"),
        F.sum("plen").alias("sum_payload_bytes"),
    ).select("n_sampled", "n_fetched_ok", "sum_payload_bytes")


# ---------------------------------------------------------------------------
# Cross-crawl revisit dedup: refetch everything a month later with a
# deterministic 1-in-7 content change; unchanged payloads must come
# back as WARC revisit records (identical-payload-digest profile) that
# store ZERO payload bytes and point at the first crawl's capture.
_RECRAWL_DELTA_S = 30 * 86400


@register(
    "warc_revisit_stats",
    """
SELECT CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resource,
       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_revisit,
       CAST(sum(CASE WHEN doc_id % 7 = 0
                     THEN octet_length(encode(text)) + 3 ELSE 0 END)
            AS BIGINT) AS stored_bytes,
       CAST(sum(CASE WHEN doc_id % 7 <> 0
                     THEN octet_length(encode(text)) ELSE 0 END)
            AS BIGINT) AS deduped_bytes,
       CAST(count(*) AS BIGINT) AS n_digest_ok,
       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_refers_ok
FROM documents
""",
)
def warc_revisit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two crawls through the WARC sink: crawl 1 archives every doc;
    crawl 2 (30 days later, every 7th doc's content changed with a
    ``' v2'`` suffix) is deduped against crawl 1's CDX index via
    ``plan_revisits`` — changed docs become full resource records,
    unchanged docs become zero-payload revisit records whose
    payload-digest matches crawl 1's capture of the same URL and whose
    refers-date is crawl 1's fetch time. ``deduped_bytes`` (payload
    bytes NOT re-stored) is recovered engine-side by joining the
    revisits back to crawl 1's verified payloads; the oracle states
    every quantity closed-form over ``documents``.

    Scale shape: the dedup decision is one digest map + one url
    equijoin against the O(records) CDX index — crawl 1's payload
    bytes are never re-read to decide; the deduped-bytes audit join
    moves crawl 1 lengths, not payloads."""
    scratch = _fresh_scratch("warc_revisit_q")
    dir1 = os.path.join(scratch, "crawl1")
    dir2 = os.path.join(scratch, "crawl2")
    os.makedirs(dir1)
    os.makedirs(dir2)

    crawl1 = _docs_as_payloads(spark, sf_dir)
    W.write_warc(crawl1, dir1, n_segments=8).collect()

    doc_id = F.regexp_extract("url", r"/d(\d+)$", 1).cast("long")
    crawl2 = crawl1.select(
        "url",
        (F.col("fetch_ts") + _RECRAWL_DELTA_S).alias("fetch_ts"),
        "content_type",
        F.when(
            doc_id % 7 == 0,
            F.concat(F.col("payload"), F.lit(b" v2")),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    planned = W.plan_revisits(crawl2, W.read_cdx(spark, dir1))
    W.write_warc(planned, dir2, n_segments=8).collect()

    back = W.read_warc_all(spark, dir2)
    # audit side: a revisit's deduped bytes = the referred capture's
    # length; lengths come from crawl 1's CDX-verified payloads
    prior = W.read_warc(spark, dir1).select(
        "url",
        F.octet_length("payload").alias("prior_len"),
        F.col("fetch_ts").alias("prior_ts"),
    )
    joined = back.join(prior, "url", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("rtype") == "resource").cast("int"))
        .cast("bigint")
        .alias("n_resource"),
        F.sum((F.col("rtype") == "revisit").cast("int"))
        .cast("bigint")
        .alias("n_revisit"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("stored_bytes"),
        F.sum(
            F.when(F.col("rtype") == "revisit", F.col("prior_len")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("deduped_bytes"),
        F.sum(F.col("digest_ok").cast("int"))
        .cast("bigint")
        .alias("n_digest_ok"),
        F.sum(
            (
                (F.col("rtype") == "revisit")
                & (F.col("refers_date") == F.col("prior_ts"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_refers_ok"),
    ).select(
        "n_records",
        "n_resource",
        "n_revisit",
        "stored_bytes",
        "deduped_bytes",
        "n_digest_ok",
        "n_refers_ok",
    )
