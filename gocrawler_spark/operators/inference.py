"""Batched model-inference harness over the image table.

The shape a 100 TB training-data pipeline needs for NSFW / aesthetic /
CLIP-tower scoring: decode + resize each payload to the model's fixed
input size, ACCUMULATE rows across Arrow batches into fixed-size
stacked tensors (B x h x w x 3), and hand each stacked batch to a
pluggable ``model_fn`` exactly the way a GPU session wants it — one
contiguous array per call, batch size chosen for device memory, NOT
whatever row count Arrow happened to deliver. Payload bytes never
leave their partition; only (image_id, int64 score) reaches the
shuffle.

``model_fn`` contract: ``(np.ndarray[B, h, w, 3] int64) ->
array-like[B] int64``. Two implementations ship:

- ``linear_probe_milli`` — a deterministic integer linear probe
  (fixed pseudo-random ±8 weight tensor, exact floor-div milli
  score). Pure function of the pixels, so the scores over the derived
  image table are pinnable (fixtures/image_probe.py) and the query is
  DuckDB-oracle-checkable end-to-end.
- ``torch_model_fn`` — the real-model entry point, stubbed behind an
  import-try (no torch in this container); the harness around it is
  fully exercised by the probe path.

The reference crawler has no inference path; this extends the image
graft axis (BASELINE.json input_hint) the way its curated-corpus
pipeline would need at scale.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gocrawler_spark.sources import synthetic_images as SI

PROBE_HW = (24, 24)  # default model input size


def probe_weights(th: int = 24, tw: int = 24) -> np.ndarray:
    """Fixed pseudo-random weight tensor in [-8, 8], th x tw x 3.
    Spatial-hash construction (three coprime multipliers XORed, mod
    17, shifted) — trivially recomputable by the fixture's naive loop,
    no RNG state to drift."""
    y = np.arange(th, dtype=np.int64).reshape(-1, 1, 1)
    x = np.arange(tw, dtype=np.int64).reshape(1, -1, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, -1)
    return ((y * 73856093) ^ (x * 19349663) ^ (c * 83492791)) % 17 - 8


def linear_probe_milli(X: np.ndarray) -> np.ndarray:
    """Deterministic stand-in scorer: integer dot product with the
    fixed weight tensor, floor-divided ONCE to milli units.
    |W| <= 8, px <= 255, n = h*w*3 <= 64^2*3 -> |1000*s| < 2^63."""
    W = probe_weights(X.shape[1], X.shape[2])
    s = (X * W).sum(axis=(1, 2, 3))
    return (1000 * s) // (X.shape[1] * X.shape[2] * 3)


def torch_model_fn(model_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Real-model entry point: load a TorchScript module and return a
    batch scorer with the same contract as linear_probe_milli. The
    container ships no torch — the harness (resize, cross-Arrow-batch
    accumulation, per-batch stacking) is identical either way and is
    fully tested through the probe path."""
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover - no torch in container
        raise NotImplementedError(
            "torch not available in this environment; use "
            "linear_probe_milli or provide a custom model_fn"
        ) from e
    raise NotImplementedError("wire torch.jit.load(model_path) here")


def infer_batched(
    images: DataFrame,
    model_fn: Callable[[np.ndarray], np.ndarray] = linear_probe_milli,
    input_hw: tuple[int, int] = PROBE_HW,
    batch_size: int = 64,
) -> DataFrame:
    """(image_id, bytes, fmt) -> (image_id, score_milli).

    Decodes and nearest-neighbor-resizes each payload to ``input_hw``,
    accumulates ACROSS Arrow batches into stacked (B, h, w, 3) int64
    tensors of exactly ``batch_size`` rows (last batch ragged), and
    calls ``model_fn`` once per stack. Arrow's own batch boundary
    (spark.sql.execution.arrow.maxRecordsPerBatch) stops dictating the
    device batch size — the two are decoupled, which is the entire
    point of the harness."""
    th, tw = input_hw

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf_ids: list = []
        buf_px: list = []

        def flush() -> pd.DataFrame:
            X = np.stack(buf_px)
            scores = np.asarray(model_fn(X), dtype=np.int64)
            out = pd.DataFrame({"image_id": list(buf_ids), "score_milli": scores})
            buf_ids.clear()
            buf_px.clear()
            return out

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                px = SI.decode_image(bytes(r.bytes), r.fmt)
                yi = (np.arange(th) * px.shape[0]) // th
                xi = (np.arange(tw) * px.shape[1]) // tw
                buf_ids.append(r.image_id)
                buf_px.append(px[yi][:, xi].astype(np.int64))
                if len(buf_ids) >= batch_size:
                    yield flush()
        if buf_ids:
            yield flush()

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, "image_id string, score_milli long"
    )
