"""Audio/video payload operators — multimodal columns beyond images.

Same design rules as operators/images.py:

- payloads are opaque BINARY cells; metadata queries must never read
  them (column pruning — asserted in tests/test_media.py);
- every heavy op is Arrow-batched ``mapInPandas`` (codecs are
  inherently per-payload; no per-row Python in Spark's row pipeline);
- validation/feature extraction is embarrassingly parallel: no
  shuffle touches payload bytes, aggregations move only small numeric
  columns;
- at 100 TB the tables are bucketed by xxhash64(id); frame-sampling /
  windowed features keep per-task memory bounded by ONE payload at a
  time (the iterator yields per input batch, and batch sizes are
  controlled by spark.sql.execution.arrow.maxRecordsPerBatch).

Compressed codecs (mp3/h264) are stubbed in sources/synthetic_media
behind import-tries; the schemas, batching, and UDF signatures here
are identical for the real and stubbed paths.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gocrawler_spark.sources import synthetic_media as SM

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, valid boolean, exact_match boolean, n_windows int, "
    "rms_mean_milli long, zcr_milli long"
)

VIDEO_FEATURES_SCHEMA = (
    "video_id string, valid boolean, exact_match boolean, n_sampled int, "
    "luma_mean_milli long, motion_milli long"
)

_DECODERS_AUDIO = {"wav": SM.decode_wav, "mp3": SM.decode_mp3}
_DECODERS_VIDEO = {"rawv": SM.decode_rawv, "h264": SM.decode_h264}


def audio_features(audio: DataFrame, window: int = 512, seed: int = 42) -> DataFrame:
    """Decode + validate + feature-extract per audio payload:
    exact-match vs the re-rendered reference signal, windowed RMS mean
    and zero-crossing rate (both milli-scaled ints — deterministic)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    samples, sr = _DECODERS_AUDIO[r.fmt](bytes(r.bytes))
                    ref = SM.reference_samples(
                        r.audio_id, int(r.n_samples), int(r.sample_rate), seed
                    )
                    exact = (
                        sr == int(r.sample_rate)
                        and len(samples) == int(r.n_samples)
                        and bool(np.array_equal(samples, ref))
                    )
                    x = samples.astype(np.float64)
                    n_win = len(x) // window
                    xw = x[: n_win * window].reshape(n_win, window)
                    rms = float(np.sqrt((xw**2).mean(axis=1)).mean()) if n_win else 0.0
                    zc = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if len(x) > 1 else 0.0
                    rows.append((r.audio_id, True, exact, n_win,
                                 round(rms * 1000), round(zc * 1000)))
                except Exception:  # noqa: BLE001 — any undecodable payload is
                    # a per-row verdict (valid=False), never a
                    # stage kill: truncated RIFF/rawv raise
                    # ValueError/struct.error, unknown fmt raises
                    # KeyError, stubbed codecs NotImplementedError
                    # (same contract as images.validate_images)
                    rows.append((r.audio_id, False, False, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "valid", "exact_match", "n_windows",
                         "rms_mean_milli", "zcr_milli"],
            )

    return audio.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def video_features(video: DataFrame, frame_stride: int = 2, seed: int = 42) -> DataFrame:
    """Decode + validate + frame-sample per video payload: every
    `frame_stride`-th frame is kept; features are mean luminance over
    sampled frames and a motion score (mean abs diff between
    consecutive sampled frames), milli-scaled ints."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    frames, fps = _DECODERS_VIDEO[r.fmt](bytes(r.bytes))
                    n, h, w, _ = frames.shape
                    ok_shape = (
                        fps == int(r.fps) and n == int(r.n_frames)
                        and h == int(r.h) and w == int(r.w)
                    )
                    ref0 = SM.reference_frame(r.video_id, 0, int(r.w), int(r.h), seed)
                    exact = ok_shape and bool(np.array_equal(frames[0], ref0))
                    sampled = frames[::frame_stride].astype(np.float64)
                    luma = sampled @ np.array([0.299, 0.587, 0.114])
                    luma_mean = float(luma.mean()) if len(sampled) else 0.0
                    motion = (
                        float(np.abs(np.diff(luma, axis=0)).mean())
                        if len(sampled) > 1
                        else 0.0
                    )
                    rows.append((r.video_id, True, exact, len(sampled),
                                 round(luma_mean * 1000), round(motion * 1000)))
                except Exception:  # noqa: BLE001 — any undecodable payload is
                    # a per-row verdict (valid=False), never a
                    # stage kill: truncated RIFF/rawv raise
                    # ValueError/struct.error, unknown fmt raises
                    # KeyError, stubbed codecs NotImplementedError
                    # (same contract as images.validate_images)
                    rows.append((r.video_id, False, False, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=["video_id", "valid", "exact_match", "n_sampled",
                         "luma_mean_milli", "motion_milli"],
            )

    return video.mapInPandas(fn, VIDEO_FEATURES_SCHEMA)
