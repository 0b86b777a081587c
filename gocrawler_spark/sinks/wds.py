"""WebDataset tar-shard export sink for the image+caption table.

WebDataset (github.com/webdataset/webdataset) is the de-facto
interchange for image+caption training data: a dataset is a sequence
of POSIX tar shards, each member pair named ``<key>.<ext>`` /
``<key>.txt``, and training loaders stream the tars sequentially.
This sink writes the accepted payload table as such shards:

- shard assignment is the SAME oracle-checked first-byte rule as
  ``image_shard_packing`` (shard = start_offset // budget over the
  decoded-pixel byte stream, exclusive prefix sum — a two-pass
  bucket-local cumsum, no single-partition window);
- each shard is built by ONE task (``applyInPandas`` over shard_id):
  members sorted by id, payload as ``<id>.png``/``<id>.qjpg``,
  caption as ``<id>.txt`` — the shard's bytes are a pure function of
  its rows (ustar headers with zeroed mtime/uid/gid), so re-exports
  are byte-identical and rsync/dedup-friendly;
- stdlib ``tarfile`` reads the output (round-trip asserted in
  tests/test_wds.py) — so does every WebDataset loader.

Scale: payload bytes move exactly once (the id-keyed join onto the
assignment), each shard materializes in one task bounded by the byte
budget, and the stats output is one row per shard.
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCK = 512


def _tar_header(name: str, size: int) -> bytes:
    """POSIX ustar header, fully deterministic (mtime/uid/gid zeroed)."""
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"member name too long: {name}")
    buf = bytearray(BLOCK)
    buf[0 : len(nb)] = nb
    buf[100:108] = b"0000644\x00"  # mode
    buf[108:116] = b"0000000\x00"  # uid
    buf[116:124] = b"0000000\x00"  # gid
    buf[124:136] = f"{size:011o}\x00".encode()  # size
    buf[136:148] = b"00000000000\x00"  # mtime = 0
    buf[148:156] = b" " * 8  # chksum placeholder (spaces while summing)
    buf[156] = ord("0")  # typeflag: regular file
    buf[257:263] = b"ustar\x00"
    buf[263:265] = b"00"
    buf[148:156] = f"{sum(buf):06o}\x00 ".encode()
    return bytes(buf)


def _tar_member(name: str, data: bytes) -> bytes:
    pad = (-len(data)) % BLOCK
    return _tar_header(name, len(data)) + data + b"\x00" * pad


def build_shard_bytes(rows: list[tuple[int, bytes, str, str]]) -> bytes:
    """rows = [(iid, payload, fmt, caption)] — sorted by iid inside,
    so shard bytes are independent of upstream row order."""
    out = []
    for iid, payload, fmt, caption in sorted(rows, key=lambda r: r[0]):
        key = f"{iid:09d}"
        out.append(_tar_member(f"{key}.{fmt}", payload))
        out.append(_tar_member(f"{key}.txt", caption.encode("utf-8")))
    out.append(b"\x00" * (2 * BLOCK))  # end-of-archive
    return b"".join(out)


def export_webdataset(
    images: DataFrame, out_dir: str, shard_bytes: int = 65536
) -> DataFrame:
    """Write the image table as WebDataset tar shards; returns one
    stats row per shard (shard_id, n_members, tar_bytes, sha256,
    path).

    This is an ACTION, like ``df.write``: the export job runs inside
    this call and the returned frame is a small local stats table (one
    row per shard). Running eagerly is what makes stale-shard hygiene
    sound — after the write, any ``wds-*.tar`` whose shard id is NOT
    in the produced set is deleted (a previous export of a larger or
    differently-laid-out table would otherwise leave shards behind
    that ghost back in through read_webdataset's glob). Cleanup
    happens strictly AFTER the new shards are on disk, so an export
    that fails mid-job never deletes anything, and the shard-id set
    comes from the job's own output — no extra pass over the payload
    pipeline, and interior shard-id gaps (a single payload larger than
    ``shard_bytes`` skips ids) are handled, not just the tail.
    Append-only re-exports (a superset table) rewrite surviving shards
    byte-identically."""
    from gocrawler_spark.operators.prefix import exclusive_prefix_sum

    os.makedirs(out_dir, exist_ok=True)
    meta = images.select(
        F.col("image_id").cast("long").alias("iid"),
        (F.col("w") * F.col("h") * F.lit(3)).cast("long").alias("px"),
    )
    spans = exclusive_prefix_sum(meta, "iid", "px", "start_off")
    asg = spans.select(
        "iid", F.expr(f"start_off div {shard_bytes}").alias("shard_id")
    )
    rows = images.select(
        F.col("image_id").cast("long").alias("iid"), "bytes", "fmt", "caption"
    ).join(asg, "iid")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        data = build_shard_bytes(
            [
                (int(r.iid), bytes(r.bytes), r.fmt, r.caption)
                for r in pdf.itertuples(index=False)
            ]
        )
        path = os.path.join(out_dir, f"wds-{sid:05d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_members": [2 * len(pdf)],
                "tar_bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
                "path": [path],
            }
        )

    schema = (
        "shard_id long, n_members long, tar_bytes long, sha256 string,"
        " path string"
    )
    stats = rows.groupBy("shard_id").applyInPandas(build, schema).collect()
    produced = {int(r["shard_id"]) for r in stats}
    for p in glob.glob(os.path.join(out_dir, "wds-*.tar")):
        try:
            sid = int(os.path.basename(p)[4:-4])
        except ValueError:
            continue
        if sid not in produced:
            os.remove(p)
    return images.sparkSession.createDataFrame(stats, schema)


def read_webdataset(spark: SparkSession, in_dir: str) -> DataFrame:
    """Source side: stream the shards back as (shard_id, iid, fmt,
    payload_bytes, caption) rows — binaryFile scan + stdlib tarfile
    parse per shard, one task per tar."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import tarfile

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                sid = int(os.path.basename(r.path).split("-")[1].split(".")[0])
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(r.content)), mode="r:"
                ) as tf:
                    bufs: dict[str, dict] = {}
                    for m in tf.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        d = bufs.setdefault(key, {})
                        d[ext if ext == "txt" else "img"] = (
                            tf.extractfile(m).read(),
                            ext,
                        )
                    for key, d in bufs.items():
                        payload, fmt = d["img"]
                        rows.append(
                            (
                                sid,
                                int(key),
                                fmt,
                                len(payload),
                                d["txt"][0].decode("utf-8"),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "iid", "fmt", "payload_len", "caption"],
            )

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(in_dir, "wds-*.tar"))
        .select("path", "content")
        .mapInPandas(
            parse,
            "shard_id long, iid long, fmt string, payload_len long, caption string",
        )
    )
