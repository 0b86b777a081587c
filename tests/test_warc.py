"""WARC 1.1 sink/source (sinks/warc.py): format, robustness, round-trip."""

import gzip
import os

from pyspark.sql import functions as F

from gocrawler_spark.sinks.warc import (
    block_digest,
    build_record,
    build_warcinfo,
    iter_records,
    read_warc,
    write_warc,
)


def test_record_is_deterministic_and_well_formed():
    r1 = build_record("https://x/p", 1767225600, "text/html", b"hello")
    r2 = build_record("https://x/p", 1767225600, "text/html", b"hello")
    assert r1 == r2  # uuid5 record id + fixed date -> byte-stable
    assert r1.startswith(b"WARC/1.1\r\n")
    assert b"WARC-Type: resource\r\n" in r1
    assert b"Content-Length: 5\r\n" in r1
    assert r1.endswith(b"hello\r\n\r\n")


def test_iter_records_plain_and_gzip_multimember():
    recs = [
        build_warcinfo(1767225600),
        build_record("https://x/a", 1767225600, "text/html", b"aaa"),
        build_record("https://x/b", 1767225601, "image/png", b"\x89PNG"),
    ]
    plain = b"".join(recs)
    gz = b"".join(gzip.compress(r, mtime=0) for r in recs)
    for blob in (plain, gz):
        out = list(iter_records(blob))
        assert [h.get("warc-type") for h, _ in out] == [
            "warcinfo",
            "resource",
            "resource",
        ]
        assert out[1][1] == b"aaa"
        assert out[2][1] == b"\x89PNG"
        assert out[2][0]["warc-target-uri"] == "https://x/b"


def test_digest_detects_tamper():
    r = build_record("https://x/a", 1767225600, "text/html", b"payload!")
    ((headers, payload),) = list(iter_records(r))
    assert headers["warc-block-digest"] == block_digest(payload)
    tampered = r.replace(b"payload!", b"tampered")
    ((h2, p2),) = list(iter_records(tampered))
    assert h2["warc-block-digest"] != block_digest(p2)


def test_iter_records_survives_garbage_and_truncation():
    assert list(iter_records(b"")) == []
    assert list(iter_records(b"\x00\x01 not a warc")) == []
    assert list(iter_records(b"\x1f\x8b broken gzip header")) == []
    r = build_record("https://x/a", 1767225600, "text/html", b"full")
    # truncated second record: first still parses, tail dropped
    blob = r + r[: len(r) // 2]
    out = list(iter_records(blob))
    assert len(out) == 1 and out[0][1] == b"full"
    # garbage between records stops the scan (no resync guess)
    assert len(list(iter_records(r + b"JUNK" + r))) == 1


def test_spark_roundtrip_byte_equal(spark, tmp_path):
    rows = [
        (f"https://l{i % 3}.example/d{i}", 1767225600 + i,
         "application/octet-stream", bytes([i]) * (i + 1))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts long, content_type string, payload binary"
    )
    out = str(tmp_path / "warc")
    man = write_warc(df, out, n_segments=4).collect()
    assert sum(m["n_records"] for m in man) == 20
    segs = [f for f in sorted(os.listdir(out)) if ".warc" in f]
    assert segs and all(f.endswith(".warc.gz") for f in segs)
    back = read_warc(spark, out)
    got = {
        r["url"]: (r["fetch_ts"], r["content_type"], bytes(r["payload"]),
                   r["digest_ok"])
        for r in back.collect()
    }
    assert len(got) == 20
    for url, ts, ct, payload in rows:
        bts, bct, bpayload, ok = got[url]
        assert (bts, bct, bpayload, ok) == (ts, ct, payload, True)


def test_write_is_deterministic_across_partitionings(spark, tmp_path):
    rows = [
        (f"https://h/{i}", 1767225600, "text/plain", str(i).encode())
        for i in range(50)
    ]
    schema = "url string, fetch_ts long, content_type string, payload binary"
    outs = []
    for n_part, sub in ((1, "a"), (7, "b")):
        df = spark.createDataFrame(rows, schema).repartition(n_part)
        out = str(tmp_path / sub)
        write_warc(df, out, n_segments=3).collect()
        outs.append(
            {
                f: open(os.path.join(out, f), "rb").read()
                for f in os.listdir(out)
            }
        )
    assert outs[0] == outs[1]  # same bytes regardless of input layout


def test_uncompressed_mode(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://h/1", 1767225600, "text/plain", b"x")],
        "url string, fetch_ts long, content_type string, payload binary",
    )
    out = str(tmp_path / "plain")
    write_warc(df, out, n_segments=1, compress=False).collect()
    (f,) = [x for x in os.listdir(out) if ".warc" in x]
    assert f.endswith(".warc")
    blob = open(os.path.join(out, f), "rb").read()
    assert blob.startswith(b"WARC/1.1")
    n = read_warc(spark, out).agg(
        F.sum(F.when(F.col("digest_ok"), 1)).alias("n")
    ).first()["n"]
    assert n == 1


def test_image_payloads_roundtrip_decode(spark, tmp_path):
    """The graft axis end-to-end: PNG image payloads sunk to WARC and
    sourced back must decode to the EXACT original pixels (the
    north_rule's per-row invariant — lossless codec, so byte/pixel
    equality, not just PSNR)."""
    import numpy as np

    from gocrawler_spark.sources.synthetic_images import (
        decode_png,
        encode_png,
        render_pixels,
    )

    rows = []
    pixels = {}
    for i in range(6):
        iid = f"img-{i}"
        px = render_pixels(iid, 24 + i, 16 + i)
        pixels[iid] = px
        rows.append(
            (f"https://img.example/{iid}.png", 1767225600 + i,
             "image/png", encode_png(px))
        )
    df = spark.createDataFrame(
        rows, "url string, fetch_ts long, content_type string, payload binary"
    )
    out = str(tmp_path / "imgwarc")
    write_warc(df, out, n_segments=2).collect()
    back = read_warc(spark, out).filter(
        F.col("content_type") == "image/png"
    )
    got = {r["url"]: bytes(r["payload"]) for r in back.collect()}
    assert len(got) == 6
    for i in range(6):
        iid = f"img-{i}"
        px = decode_png(got[f"https://img.example/{iid}.png"])
        assert px.shape == pixels[iid].shape
        assert np.array_equal(px, pixels[iid])


def test_cdx_random_access(spark, tmp_path):
    from gocrawler_spark.sinks.warc import fetch_record, read_cdx

    rows = [
        (f"https://h.example/p{i}", 1767225600 + i, "text/plain",
         f"payload-{i}".encode())
        for i in range(15)
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts long, content_type string, payload binary"
    )
    for compress, sub in ((True, "gz"), (False, "plain")):
        out = str(tmp_path / sub)
        write_warc(df, out, n_segments=3, compress=compress).collect()
        idx = {r["url"]: r for r in read_cdx(spark, out).collect()}
        assert len(idx) == 15
        for url, ts, _, payload in rows:
            e = idx[url]
            headers, got = fetch_record(
                out, e["file"], e["offset"], e["rlen"]
            )
            assert got == payload
            assert headers["warc-target-uri"] == url
            assert e["fetch_ts"] == ts
        # a wrong span is loud, not empty
        e = idx[rows[0][0]]
        try:
            fetch_record(out, e["file"], e["offset"] + 1, e["rlen"])
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_revisit_record_well_formed():
    from gocrawler_spark.sinks.warc import build_revisit

    dg = block_digest(b"same bytes")
    r = build_revisit("https://x/a", 1769817600, "text/html", dg, 1767225600)
    assert r == build_revisit(
        "https://x/a", 1769817600, "text/html", dg, 1767225600
    )
    ((headers, payload),) = list(iter_records(r))
    assert headers["warc-type"] == "revisit"
    assert payload == b""
    assert headers["warc-payload-digest"] == dg
    assert headers["warc-refers-to-target-uri"] == "https://x/a"
    assert headers["warc-refers-to-date"] == "2026-01-01T00:00:00Z"
    assert "identical-payload-digest" in headers["warc-profile"]


def test_revisit_cross_crawl_dedup(spark, tmp_path):
    from gocrawler_spark.sinks.warc import (
        fetch_record,
        parse_segments,
        plan_revisits,
        read_cdx,
        read_warc_all,
    )

    rows1 = [
        (f"https://x/d{i}", 1767225600 + i, "text/html",
         f"content-{i}".encode())
        for i in range(12)
    ]
    schema = "url string, fetch_ts long, content_type string, payload binary"
    d1 = str(tmp_path / "c1")
    write_warc(spark.createDataFrame(rows1, schema), d1, n_segments=2).collect()

    # refetch a month later: docs 0/3/6/9 changed, the rest identical
    rows2 = [
        (u, ts + 2592000, ct, p + b" v2" if i % 3 == 0 else p)
        for i, (u, ts, ct, p) in enumerate(rows1)
    ]
    planned = plan_revisits(
        spark.createDataFrame(rows2, schema), read_cdx(spark, d1)
    )
    d2 = str(tmp_path / "c2")
    write_warc(planned, d2, n_segments=2).collect()

    back = {r["url"]: r for r in read_warc_all(spark, d2).collect()}
    assert len(back) == 12
    for i, (u, ts, ct, p) in enumerate(rows1):
        r = back[u]
        assert r["digest_ok"]
        if i % 3 == 0:
            assert r["rtype"] == "resource"
            assert bytes(r["payload"]) == p + b" v2"
        else:
            assert r["rtype"] == "revisit"
            assert bytes(r["payload"]) == b""
            assert r["payload_digest"] == block_digest(p)
            assert r["refers_date"] == ts  # crawl 1's capture time

    # the back-compat reader must skip revisits entirely
    legacy = read_warc(spark, d2).collect()
    assert len(legacy) == 4 and all(r["digest_ok"] for r in legacy)

    # CDX random access straight into a revisit span
    idx = {
        r["url"]: r
        for r in read_cdx(spark, d2).collect()
    }
    rv = idx["https://x/d1"]
    assert rv["rtype"] == "revisit"
    headers, payload = fetch_record(
        d2, rv["file"], int(rv["offset"]), int(rv["rlen"])
    )
    assert headers["warc-type"] == "revisit" and payload == b""
    assert rv["digest"] == block_digest(b"content-1")
