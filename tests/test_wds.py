"""WebDataset tar sink/source: stdlib-tarfile compatibility, byte
determinism, and a payload-exact export/read round trip."""

import io
import os
import tarfile

from pyspark.sql import functions as F

from gocrawler_spark.sinks import wds as WDS
from gocrawler_spark.sources import synthetic_images as SI


def test_tar_bytes_deterministic_and_tarfile_readable():
    rows = [(5, b"PAYLOAD5", "png", "cap five"), (3, b"P3", "qjpg", "café ✓")]
    data = WDS.build_shard_bytes(rows)
    assert data == WDS.build_shard_bytes(list(reversed(rows)))  # order-free
    assert len(data) % 512 == 0
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
        assert tf.getnames() == [
            "000000003.qjpg",
            "000000003.txt",
            "000000005.png",
            "000000005.txt",
        ]
        assert tf.extractfile("000000003.txt").read().decode() == "café ✓"
        assert tf.extractfile("000000005.png").read() == b"PAYLOAD5"


def test_export_read_round_trip_payload_exact(spark, tmp_path):
    out = str(tmp_path / "wds")
    rows = []
    for d in range(30):
        w, h = 16 + d % 9, 16 + d % 7
        px = SI.render_pixels(str(d), w, h)
        fmt = "qjpg" if d % 3 == 0 else "png"
        data = SI.encode_png(px) if fmt == "png" else SI.encode_qjpg(px)
        rows.append((str(d), data, w, h, fmt, f"caption {d}", 0))
    imgs = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    stats = WDS.export_webdataset(imgs, out, shard_bytes=4096).collect()
    assert len(stats) > 1  # budget actually splits
    assert sum(r["n_members"] for r in stats) == 60  # 2 per image
    # deterministic re-export: same shard digests
    stats2 = WDS.export_webdataset(imgs, out, shard_bytes=4096).collect()
    assert sorted(r["sha256"] for r in stats) == sorted(
        r["sha256"] for r in stats2
    )

    back = WDS.read_webdataset(spark, out)
    got = {r["iid"]: r for r in back.collect()}
    assert sorted(got) == list(range(30))
    payload = {int(r[0]): r[1] for r in rows}
    # payload bytes survive the tar byte-exactly (length checked via
    # the source; full bytes via direct tarfile read of one shard)
    for d, r in got.items():
        assert r["payload_len"] == len(payload[d])
        assert r["caption"] == f"caption {d}"
    with tarfile.open(stats[0]["path"], "r:") as tf:
        name = [n for n in tf.getnames() if not n.endswith(".txt")][0]
        d = int(name.split(".")[0])
        assert tf.extractfile(name).read() == payload[d]
    # shard ids are contiguous ranges in id order (first-byte rule)
    spans = sorted(
        (r["shard_id"], r["iid"]) for r in back.collect()
    )
    by_shard = {}
    for sid, iid in spans:
        by_shard.setdefault(sid, []).append(iid)
    flat = [i for sid in sorted(by_shard) for i in sorted(by_shard[sid])]
    assert flat == list(range(30))


def test_incremental_append_only_rewrites_tail_shard(spark, tmp_path):
    """First-byte packing + deterministic bytes ⇒ appending new images
    changes ONLY the last (partial) shard: every earlier shard's
    sha256 is identical across exports — incremental publishing at
    100 TB re-uploads one shard per append, not the corpus."""

    def imgs_upto(n):
        rows = []
        for d in range(n):
            w, h = 16 + d % 9, 16 + d % 7
            px = SI.render_pixels(str(d), w, h)
            rows.append((str(d), SI.encode_png(px), w, h, "png", f"c{d}", 0))
        return spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = {r["shard_id"]: r["sha256"]
          for r in WDS.export_webdataset(imgs_upto(20), out1, 4096).collect()}
    s2 = {r["shard_id"]: r["sha256"]
          for r in WDS.export_webdataset(imgs_upto(32), out2, 4096).collect()}
    assert len(s2) > len(s1)
    last = max(s1)
    for sid, digest in s1.items():
        if sid != last:
            assert s2[sid] == digest, sid


def test_reexport_smaller_set_removes_stale_tail_shards(spark, tmp_path):
    """Re-exporting a SMALLER table into the same dir must delete the
    retired tail shards — otherwise read_webdataset's wds-*.tar glob
    resurrects rows from the previous, larger export."""
    out = str(tmp_path / "wds_shrink")

    def table(n):
        rows = []
        for d in range(n):
            w, h = 16 + d % 9, 16 + d % 7
            px = SI.render_pixels(str(d), w, h)
            rows.append((str(d), SI.encode_png(px), w, h, "png", f"c{d}", 0))
        return spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )

    big = WDS.export_webdataset(table(30), out, shard_bytes=4096).collect()
    small = WDS.export_webdataset(table(12), out, shard_bytes=4096).collect()
    assert len(small) < len(big)
    back = WDS.read_webdataset(spark, out)
    assert sorted(r["iid"] for r in back.collect()) == list(range(12))
    # append-only direction still byte-stable: re-exporting the big
    # table again reproduces the original shard digests exactly
    big2 = WDS.export_webdataset(table(30), out, shard_bytes=4096).collect()
    assert sorted(r["sha256"] for r in big2) == sorted(
        r["sha256"] for r in big
    )
