r"""WARC source + sink (ISO 28500 / WARC 1.1), the web-archive format.

The reference persists fetched pages only as its in-memory/gob cache
(memoizedFetchUrl, /root/reference/crawler.go:560-585) — nothing a
downstream system can read. A web-scale crawler's durable fetch log is
a WARC file set (the Common Crawl / Internet Archive interchange
format), so the engine gets a real one:

- ``write_warc(df, out_dir)`` — sink a DataFrame of fetched payloads
  ``(url string, fetch_ts long, content_type string, payload binary)``
  as WARC segment files, one file per hash-assigned segment, written
  INSIDE an ``applyInPandas`` task (no payload ever moves to the
  driver; the returned manifest frame is O(segments)). Records are
  ``WARC-Type: resource`` with deterministic ``WARC-Record-ID``
  (uuid5 of url|date) and ``WARC-Block-Digest`` (sha1, base32 — the
  convention readers verify). ``compress=True`` writes one gzip
  member PER RECORD concatenated into a ``.warc.gz`` (the standard
  layout that keeps record-level random access), ``mtime=0`` so the
  bytes are reproducible.
- ``read_warc(spark, dir)`` — source the segment files back through
  Spark's ``binaryFile`` reader + an Arrow-batched parser, verifying
  each record's block digest. Never throws on garbage: unparseable
  tails are dropped, foreign record types (warcinfo, request, ...)
  are skipped.

Scale shape: write is one shuffle (groupBy segment) then pure
sequential file IO per task; read is an embarrassingly parallel scan
(one task per file, ``binaryFile`` splits by file). On a cluster
``out_dir`` must be shared storage (DFS/object store) — executors
write it directly; local mode uses the local filesystem.

Segment sizing at 100 TB: records are append-only and immutable, so
pick ``n_segments`` ≈ total_bytes / 1 GiB (the Common Crawl segment
convention) — each task streams one segment, memory bounded by the
largest single record, not the segment.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os
import uuid
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SOFTWARE = "gocrawler-spark/0.1"


def _iso(ts: int) -> str:
    return (
        datetime.fromtimestamp(int(ts), tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    )


def block_digest(payload: bytes) -> str:
    """``sha1:BASE32`` block digest (the WARC convention)."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def build_record(
    url: str, fetch_ts: int, content_type: str, payload: bytes,
    digest: str | None = None,
) -> bytes:
    """One ``resource`` record, byte-deterministic for fixed inputs.
    Pass ``digest`` (a ``block_digest`` result) when the caller already
    hashed the payload — write_warc computes it once per row for the
    CDX column, and sha1-ing multi-MB payloads twice is real money on
    the durable-log write path."""
    date = _iso(fetch_ts)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}")
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: resource\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Block-Digest: {digest if digest is not None else block_digest(payload)}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def build_revisit(
    url: str,
    fetch_ts: int,
    content_type: str,
    payload_digest: str,
    refers_date: int,
) -> bytes:
    """One ``revisit`` record (WARC 1.1 §6.7.2, profile
    identical-payload-digest — the Common Crawl cross-crawl dedup
    convention): a re-fetch whose payload digest equals an earlier
    capture stores NO payload bytes, only the digest and a pointer to
    the capture it duplicates."""
    date = _iso(fetch_ts)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}|revisit")
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: revisit\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
        "identical-payload-digest\r\n"
        f"WARC-Refers-To-Target-URI: {url}\r\n"
        f"WARC-Refers-To-Date: {_iso(refers_date)}\r\n"
        f"WARC-Payload-Digest: {payload_digest}\r\n"
        f"Content-Type: {content_type}\r\n"
        "Content-Length: 0\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + b"\r\n\r\n"


def build_warcinfo(date_ts: int) -> bytes:
    fields = (
        f"software: {_SOFTWARE}\r\nformat: WARC file version 1.1\r\n"
    ).encode("utf-8")
    date = _iso(date_ts)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"warcinfo|{date}")
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(fields)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + fields + b"\r\n\r\n"


def iter_records(blob: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per record from one WARC file's
    bytes (gzipped — possibly multi-member — or plain). Robust: stops
    at the first structurally unreadable position instead of raising
    (a crawler's reader must survive truncated segments)."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob)  # handles member concatenation
        except OSError:
            return
    i, n = 0, len(blob)
    while i < n:
        while blob[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        if not blob[i:].startswith(b"WARC/"):
            return
        he = blob.find(b"\r\n\r\n", i)
        if he < 0:
            return
        headers: dict[str, str] = {}
        head = blob[i:he].decode("utf-8", "replace")
        for ln in head.split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        start = he + 4
        if start + clen > n:
            return  # truncated record
        yield headers, blob[start : start + clen]
        i = start + clen


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_segments: int = 8,
    compress: bool = True,
) -> DataFrame:
    """Sink ``(url, fetch_ts, content_type, payload)`` rows as WARC
    segments under ``out_dir``; returns the manifest frame
    ``(file, n_records, file_bytes)`` — NOT yet materialized, run an
    action on it to execute the write. Rows are segment-assigned by
    url hash and written in url order, so the file set is byte-
    deterministic for a fixed input regardless of input partitioning.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        # (url, fetch_ts) + mergesort: a fetch log may hold the same
        # URL twice (re-crawls, revisit planning), and a url-only
        # unstable sort would make record order — and therefore the
        # segment bytes and CDX offsets — depend on shuffle arrival
        # order, breaking the byte-determinism contract
        pdf = pdf.sort_values(["url", "fetch_ts"], kind="mergesort")
        sid = int(pdf["seg"].iloc[0])
        name = f"seg-{sid:05d}.warc" + (".gz" if compress else "")
        first_ts = int(pdf["fetch_ts"].iloc[0])
        has_revisits = "is_revisit" in pdf.columns
        chunks = [build_warcinfo(first_ts)]
        urls, tss, rtypes, digests = [], [], [], []
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload)
            digest = block_digest(payload)
            if has_revisits and bool(r.is_revisit):
                chunks.append(
                    build_revisit(
                        str(r.url),
                        int(r.fetch_ts),
                        str(r.content_type),
                        digest,
                        int(r.refers_date),
                    )
                )
                rtypes.append("revisit")
            else:
                chunks.append(
                    build_record(
                        str(r.url),
                        int(r.fetch_ts),
                        str(r.content_type),
                        payload,
                        digest=digest,
                    )
                )
                rtypes.append("resource")
            urls.append(str(r.url))
            tss.append(int(r.fetch_ts))
            digests.append(digest)
        if compress:
            chunks = [
                gzip.compress(c, compresslevel=6, mtime=0) for c in chunks
            ]
        data = b"".join(chunks)
        # CDX-style record index: (offset, length) of each resource
        # record's file span — the gzip member for .warc.gz (member
        # boundaries ARE record boundaries, so a seek+read of the span
        # decompresses standalone), the raw record span otherwise.
        offsets, lengths, off = [], [], len(chunks[0])  # skip warcinfo
        for c in chunks[1:]:
            offsets.append(off)
            lengths.append(len(c))
            off += len(c)
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic publish, crash-safe
        idx = pd.DataFrame(
            {
                "url": urls,
                "fetch_ts": tss,
                "file": name,
                "offset": offsets,
                "rlen": lengths,
                "rtype": rtypes,
                "digest": digests,
            }
        )
        idx_path = os.path.join(out_dir, f"seg-{sid:05d}.cdx.parquet")
        idx.to_parquet(idx_path + ".tmp", index=False)
        os.replace(idx_path + ".tmp", idx_path)
        return pd.DataFrame(
            {
                "file": [name],
                "n_records": [len(pdf)],
                "file_bytes": [len(data)],
            }
        )

    return (
        df.withColumn("seg", F.pmod(F.xxhash64("url"), F.lit(n_segments)))
        .groupBy("seg")
        .applyInPandas(
            write_segment, "file string, n_records long, file_bytes long"
        )
    )


def plan_revisits(fetches: DataFrame, prior_cdx: DataFrame) -> DataFrame:
    """Mark each re-fetch that duplicates its URL's latest prior
    capture (identical payload digest) as a revisit: adds
    ``is_revisit boolean`` + ``refers_date long`` columns that
    ``write_warc`` turns into revisit records instead of full resource
    records — the cross-crawl storage dedup Common Crawl ships as its
    `revisit` records.

    Scale shape: one Arrow-batched digest map over the new payloads
    (per-payload hashing is inherent work, same class as the codecs),
    one groupBy(url) over the prior index (O(index), payload-free),
    one equijoin on url. Payload bytes never shuffle for the compare —
    only (url, digest) rows move."""
    @F.pandas_udf("string")
    def digest_udf(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda b: block_digest(bytes(b)))

    prior = prior_cdx.groupBy("url").agg(
        F.max_by("digest", "fetch_ts").alias("prior_digest"),
        F.max("fetch_ts").alias("prior_ts"),
    )
    cur = fetches.withColumn("digest", digest_udf(F.col("payload")))
    j = cur.join(prior, "url", "left")
    return (
        j.withColumn(
            "is_revisit",
            F.coalesce(F.col("digest") == F.col("prior_digest"), F.lit(False)),
        )
        .withColumn(
            "refers_date",
            F.when(F.col("is_revisit"), F.col("prior_ts")).otherwise(
                F.lit(-1)
            ).cast("long"),
        )
        .drop("digest", "prior_digest", "prior_ts")
    )


def parse_segments(files: DataFrame) -> DataFrame:
    """Parse a ``binaryFile``-shaped frame (a ``content`` binary
    column; batch OR streaming) into
    ``(url, fetch_ts, content_type, payload, digest_ok)`` — resource
    records only, block digest re-verified per record."""
    files = files.select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, cts, payloads, oks = [], [], [], [], []
            for blob in pdf["content"]:
                for headers, payload in iter_records(bytes(blob)):
                    if headers.get("warc-type") != "resource":
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    date = headers.get("warc-date", "")
                    try:
                        ts = int(
                            datetime.strptime(
                                date, "%Y-%m-%dT%H:%M:%SZ"
                            )
                            .replace(tzinfo=timezone.utc)
                            .timestamp()
                        )
                    except ValueError:
                        ts = -1
                    tss.append(ts)
                    cts.append(headers.get("content-type", ""))
                    payloads.append(payload)
                    oks.append(
                        headers.get("warc-block-digest", "")
                        == block_digest(payload)
                    )
            yield pd.DataFrame(
                {
                    "url": urls,
                    "fetch_ts": tss,
                    "content_type": cts,
                    "payload": payloads,
                    "digest_ok": oks,
                }
            )

    return files.mapInPandas(
        parse,
        "url string, fetch_ts long, content_type string, "
        "payload binary, digest_ok boolean",
    )


def parse_segments_all(files: DataFrame) -> DataFrame:
    """Like ``parse_segments`` but revisit-aware: emits resource AND
    revisit records as ``(url, fetch_ts, content_type, payload,
    digest_ok, rtype, payload_digest, refers_date)``. A resource's
    ``payload_digest`` is its verified block digest; a revisit carries
    an empty payload, the duplicated capture's digest, and the epoch
    of the capture it refers to (``-1`` if the header is missing or
    malformed). ``digest_ok`` for a revisit means structural validity:
    empty block + a payload-digest header present."""
    files = files.select("content")

    def _ts(iso: str) -> int:
        try:
            return int(
                datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
        except ValueError:
            return -1

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "fetch_ts": [], "content_type": [],
                "payload": [], "digest_ok": [], "rtype": [],
                "payload_digest": [], "refers_date": [],
            }
            for blob in pdf["content"]:
                for headers, payload in iter_records(bytes(blob)):
                    rtype = headers.get("warc-type")
                    if rtype not in ("resource", "revisit"):
                        continue
                    rows["url"].append(headers.get("warc-target-uri", ""))
                    rows["fetch_ts"].append(_ts(headers.get("warc-date", "")))
                    rows["content_type"].append(headers.get("content-type", ""))
                    rows["payload"].append(payload)
                    rows["rtype"].append(rtype)
                    if rtype == "resource":
                        dg = block_digest(payload)
                        rows["digest_ok"].append(
                            headers.get("warc-block-digest", "") == dg
                        )
                        rows["payload_digest"].append(dg)
                        rows["refers_date"].append(-1)
                    else:
                        pdg = headers.get("warc-payload-digest", "")
                        rows["digest_ok"].append(
                            payload == b"" and pdg.startswith("sha1:")
                        )
                        rows["payload_digest"].append(pdg)
                        rows["refers_date"].append(
                            _ts(headers.get("warc-refers-to-date", ""))
                        )
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        parse,
        "url string, fetch_ts long, content_type string, payload binary, "
        "digest_ok boolean, rtype string, payload_digest string, "
        "refers_date long",
    )


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """Batch-source WARC segments back through ``binaryFile`` +
    ``parse_segments``."""
    return parse_segments(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(warc_dir)
    )


def read_warc_all(spark: SparkSession, warc_dir: str) -> DataFrame:
    """Batch-source including revisit records (``parse_segments_all``)."""
    return parse_segments_all(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(warc_dir)
    )


def read_cdx(spark: SparkSession, warc_dir: str) -> DataFrame:
    """The record index written alongside the segments:
    ``(url, fetch_ts, file, offset, rlen)`` — one row per record. At
    100 TB this is the lookup table for record-level random access
    (re-parse one page, serve one payload) without scanning segments;
    it joins/broadcasts like any small dimension."""
    return spark.read.parquet(os.path.join(warc_dir, "*.cdx.parquet"))


def fetch_record(
    warc_dir: str, file: str, offset: int, rlen: int
) -> tuple[dict[str, str], bytes]:
    """Random-access one record by its index span: seek+read ``rlen``
    bytes at ``offset`` (a standalone gzip member for ``.warc.gz``),
    parse, return ``(headers, payload)``. Raises ValueError if the
    span does not contain exactly one record — an index/segment
    mismatch should be loud, not an empty result."""
    with open(os.path.join(warc_dir, file), "rb") as f:
        f.seek(offset)
        span = f.read(rlen)
    recs = list(iter_records(span))
    if len(recs) != 1:
        raise ValueError(
            f"index span {file}@{offset}+{rlen} held {len(recs)} records"
        )
    return recs[0]
