"""Streaming image+caption ingest: validate-and-commit with
exactly-once batch accounting, reject quarantine, and replay
idempotence (streaming/image_stream.py)."""

import os

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.images import build_image_table
from gocrawler_spark.streaming import image_stream as IS


@pytest.fixture(scope="module")
def img_rows(spark):
    pages = spark.createDataFrame(
        [(f"https://img{i}.example/p",) for i in range(20)], "url string"
    )
    df = build_image_table(pages).limit(24).cache()
    df.count()
    return df


def _stage(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_ingest_accepts_valid_and_quarantines_tampered(spark, tmp_path, img_rows):
    inp, ckpt, state = (str(tmp_path / d) for d in ("in", "ck", "state"))
    os.makedirs(inp, exist_ok=True)

    good = img_rows.filter(F.xxhash64("image_id") % 2 == 0)
    _stage(good, inp)
    q = IS.ingest_images(IS.image_batches_stream(spark, inp), state, ckpt)
    q.awaitTermination()
    st = IS.read_images_state(spark, state)
    n_good_valid = (
        IS.streaming_validate(good).filter(F.col("accepted")).count()
    )
    assert st.count() == n_good_valid > 0
    assert set(st.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    }

    # batch 2: half valid, half with tampered captions -> quarantined
    rest = img_rows.filter(F.xxhash64("image_id") % 2 != 0)
    tampered = rest.withColumn(
        "caption",
        F.when(
            F.xxhash64("image_id") % 4 == 1,
            F.concat(F.col("caption"), F.lit(" TAMPERED")),
        ).otherwise(F.col("caption")),
    )
    _stage(tampered, inp)
    q2 = IS.ingest_images(IS.image_batches_stream(spark, inp), state, ckpt)
    q2.awaitTermination()

    st2 = IS.read_images_state(spark, state)
    rej = IS.read_rejects(spark, state)
    assert rej is not None and rej.count() > 0
    # every tampered-caption row was rejected, none accepted
    tampered_ids = {
        r["image_id"]
        for r in tampered.filter(F.col("caption").endswith("TAMPERED"))
        .select("image_id")
        .collect()
    }
    accepted_ids = {r["image_id"] for r in st2.select("image_id").collect()}
    rejected_ids = {r["image_id"] for r in rej.select("image_id").collect()}
    assert tampered_ids <= rejected_ids
    assert not (tampered_ids & accepted_ids)
    # rejects carry the verdict columns for auditing
    assert "caption_ok" not in st2.columns  # payload table stays clean...
    # (verdicts live on the quarantine side)
    assert {"psnr_db"} <= set(rej.columns)


def test_replayed_batch_is_skipped(spark, tmp_path, img_rows):
    inp, ckpt, state = (str(tmp_path / d) for d in ("in", "ck", "state"))
    os.makedirs(inp, exist_ok=True)
    _stage(img_rows.limit(6), inp)
    q = IS.ingest_images(IS.image_batches_stream(spark, inp), state, ckpt)
    q.awaitTermination()
    before = IS.read_images_state(spark, state).count()

    # crash-replay: foreachBatch re-delivers an already-committed batch
    IS.image_upsert(state)(img_rows.limit(6), 0)
    after = IS.read_images_state(spark, state).count()
    assert after == before

    # restart on the same checkpoint with no new files: nothing changes
    q2 = IS.ingest_images(IS.image_batches_stream(spark, inp), state, ckpt)
    q2.awaitTermination()
    assert IS.read_images_state(spark, state).count() == before
