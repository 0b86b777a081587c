"""Streaming WARC ingest (streaming/warc_stream.py): exactly-once per
segment file, digest quarantine, replay idempotence."""

import os

from gocrawler_spark.sinks.warc import build_record, write_warc
from gocrawler_spark.streaming import warc_stream as WS

SCHEMA = "url string, fetch_ts long, content_type string, payload binary"


def _land_segment(spark, land_dir, rows, n_segments=1):
    df = spark.createDataFrame(rows, SCHEMA)
    write_warc(df, land_dir, n_segments=n_segments).collect()


def _rows(prefix, n):
    return [
        (f"https://{prefix}.example/p{i}", 1767225600 + i, "text/html",
         f"{prefix}-{i}".encode())
        for i in range(n)
    ]


def test_ingest_accumulates_across_restarts(spark, tmp_path):
    land, ckpt, state = (str(tmp_path / d) for d in ("land", "ck", "st"))
    os.makedirs(land, exist_ok=True)

    _land_segment(spark, land, _rows("a", 5))
    WS.ingest_warc(
        WS.warc_segments_stream(spark, land), state, ckpt
    ).awaitTermination()
    got = WS.read_warc_state(spark, state)
    assert got.count() == 5
    assert WS.read_warc_rejects(spark, state) is None

    # a second segment lands; a NEW query on the SAME checkpoint picks
    # up only the new file (exactly-once per file)
    _land_segment(spark, str(tmp_path / "land2"), _rows("b", 3))
    os.replace(
        os.path.join(str(tmp_path / "land2"), "seg-00000.warc.gz"),
        os.path.join(land, "seg-00001.warc.gz"),
    )
    WS.ingest_warc(
        WS.warc_segments_stream(spark, land), state, ckpt
    ).awaitTermination()
    rows = {r["url"]: bytes(r["payload"])
            for r in WS.read_warc_state(spark, state).collect()}
    assert len(rows) == 8
    assert rows["https://b.example/p2"] == b"b-2"


def test_digest_failures_quarantine(spark, tmp_path):
    land, ckpt, state = (str(tmp_path / d) for d in ("land", "ck", "st"))
    os.makedirs(land, exist_ok=True)
    good = build_record(
        "https://x.example/ok", 1767225600, "text/html", b"good-payload"
    )
    bad = build_record(
        "https://x.example/bad", 1767225600, "text/html", b"tamper-me!"
    ).replace(b"tamper-me!", b"tampered!!")
    with open(os.path.join(land, "seg-manual.warc"), "wb") as f:
        f.write(good + bad)
    WS.ingest_warc(
        WS.warc_segments_stream(spark, land), state, ckpt
    ).awaitTermination()
    acc = WS.read_warc_state(spark, state).collect()
    rej = WS.read_warc_rejects(spark, state).collect()
    assert [r["url"] for r in acc] == ["https://x.example/ok"]
    assert [r["url"] for r in rej] == ["https://x.example/bad"]


def test_replayed_batch_is_skipped(spark, tmp_path):
    land, state = str(tmp_path / "land"), str(tmp_path / "st")
    os.makedirs(land, exist_ok=True)
    os.makedirs(state, exist_ok=True)
    _land_segment(spark, land, _rows("a", 4))
    files = spark.read.format("binaryFile").load(land)
    up = WS.warc_upsert(state)
    up(files, 0)
    assert WS.read_warc_state(spark, state).count() == 4
    # at-least-once replay of the same batch_id: no double-count
    up(files, 0)
    assert WS.read_warc_state(spark, state).count() == 4
    # next batch appends
    up(files, 1)
    assert WS.read_warc_state(spark, state).count() == 8
