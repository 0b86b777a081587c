"""Batched-inference harness tests (operators/inference.py).

The fixture drift guard (pinned == naive == engine) plus the
batch-shape contract: model_fn must receive stacked (B, h, w, 3)
tensors of exactly batch_size rows regardless of how Arrow chunked
the input, with one ragged tail.
"""

import numpy as np
import pytest
from pyspark.sql import SparkSession

from gocrawler_spark.operators import inference as INF
from gocrawler_spark.sources import synthetic_images as SI


@pytest.fixture(scope="module")
def spark():
    from tests.conftest import session_confs

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    with session_confs(
        s,
        {
            "spark.sql.shuffle.partitions": "8",
            # tiny Arrow batches: forces the harness to accumulate
            # ACROSS them to reach the device batch size
            "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
        },
    ):
        yield s


def test_probe_fixture_matches_naive_and_vectorized():
    from gocrawler_spark.fixtures import image_probe as PF

    assert PF.PROBE == PF.regenerate()
    # vectorized scorer on a hand-built stack agrees with the pinned value
    for d in (0, 1, 3, 50, 299):
        w, h = 16 + d % 49, 16 + (d * 7) % 49
        fmt = "qjpg" if d % 3 == 0 else "png"
        if d % 5 == 1 and d > 0:
            p = d - 1
            rid, w, h = str(p), 16 + p % 49, 16 + (p * 7) % 49
        else:
            rid = str(d)
        px = SI.render_pixels(rid, w, h)
        data = SI.encode_png(px) if fmt == "png" else SI.encode_qjpg(px)
        dec = SI.decode_image(data, fmt)
        yi = (np.arange(24) * dec.shape[0]) // 24
        xi = (np.arange(24) * dec.shape[1]) // 24
        X = np.stack([dec[yi][:, xi].astype(np.int64)])
        assert int(INF.linear_probe_milli(X)[0]) == PF.PROBE[d][1]


def test_infer_batched_stacks_across_arrow_batches(spark):
    """With Arrow delivering 7-row chunks and batch_size=10, a
    25-image partition must produce model_fn calls of exactly
    [10, 10, 5] — proving the harness decouples device batches from
    Arrow batches. Scores must equal the pinned fixture."""
    from gocrawler_spark.fixtures import image_probe as PF

    n = 25
    rows = []
    for d in range(n):
        w, h = 16 + d % 49, 16 + (d * 7) % 49
        px = SI.render_pixels(str(d), w, h)
        rows.append((str(d), SI.encode_png(px), "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    ).coalesce(1)

    def shape_checking_fn(X):
        assert X.ndim == 4 and X.shape[1:] == (24, 24, 3), X.shape
        assert X.shape[0] <= 10
        return INF.linear_probe_milli(X)

    out = {
        r["image_id"]: r["score_milli"]
        for r in INF.infer_batched(
            df, model_fn=shape_checking_fn, batch_size=10
        ).collect()
    }
    assert len(out) == n
    pinned = dict(PF.PROBE)
    # non-twin ids that the fixture also encodes as png (d % 3 != 0):
    # identical bytes -> score equals the pinned value
    for d in range(n):
        if d % 3 != 0 and not (d % 5 == 1 and d > 0):
            assert out[str(d)] == pinned[d], d


def test_infer_batched_batch_sizes_exact(spark):
    """Count the exact batch sizes model_fn sees on one partition."""
    n = 23
    rows = []
    for d in range(n):
        px = SI.render_pixels(str(d), 16, 16)
        rows.append((str(d), SI.encode_png(px), "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    ).coalesce(1)

    def tagging_fn(X):
        # encode the observed batch size into every score
        return np.full(X.shape[0], X.shape[0], dtype=np.int64)

    sizes = [
        r["score_milli"]
        for r in INF.infer_batched(df, model_fn=tagging_fn, batch_size=8).collect()
    ]
    assert sorted(sizes) == [7] * 7 + [8] * 16  # 8, 8, 7


def test_torch_stub_raises():
    with pytest.raises(NotImplementedError):
        INF.torch_model_fn("/nonexistent/model.pt")
