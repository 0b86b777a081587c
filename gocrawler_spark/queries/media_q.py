"""Audio/video multimodal queries (training-data pipeline extensions).

Same contract as image_q: the payload tables are generated
deterministically from `documents.doc_id` inside mapInPandas, so
metadata-level queries have exact SQL oracles (the metadata is a pure
formula of doc_id), while decode/feature queries are Python-side and
registered rows-only (the driver records the weaker check; decode
correctness is covered by tests/test_media.py round-trips instead).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.fixtures import media_feats as MF
from gocrawler_spark.operators import media as MD
from gocrawler_spark.queries import load, register
from gocrawler_spark.sources import synthetic_media as SM

N_MEDIA = 120  # payload count cap — media decode is the slow path


def audio_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(audio_id, bytes, sample_rate, n_samples, fmt, caption) — pure
    function of doc_id; fmt 'mp3' rows carry wav bytes but exercise the
    stubbed-decoder path downstream."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_MEDIA)
        .select("doc_id", F.substring("text", 1, 48).alias("caption"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                sr = 8000 + (d % 3) * 4000
                n = 2048 + (d * 37) % 4096
                fmt = "mp3" if d % 7 == 0 and d > 0 else "wav"
                pcm = SM.reference_samples(str(d), n, sr)
                rows.append(
                    {
                        "audio_id": str(d),
                        "bytes": SM.encode_wav(pcm, sr),
                        "sample_rate": sr,
                        "n_samples": n,
                        "fmt": fmt,
                        "caption": r.caption,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "bytes", "sample_rate", "n_samples",
                         "fmt", "caption"],
            )

    return docs.mapInPandas(gen, MD.AUDIO_SCHEMA)


def video_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_MEDIA)
        .select("doc_id", F.substring("text", 1, 48).alias("caption"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                w, h = 16 + d % 17, 16 + (d * 5) % 17
                fps = 8 + (d % 5) * 4
                n = 4 + d % 13
                fmt = "h264" if d % 11 == 0 and d > 0 else "rawv"
                frames = np.stack(
                    [SM.reference_frame(str(d), f, w, h) for f in range(n)]
                )
                rows.append(
                    {
                        "video_id": str(d),
                        "bytes": SM.encode_rawv(frames, fps),
                        "w": w,
                        "h": h,
                        "fps": fps,
                        "n_frames": n,
                        "fmt": fmt,
                        "caption": r.caption,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "fps", "n_frames",
                         "fmt", "caption"],
            )

    return docs.mapInPandas(gen, MD.VIDEO_SCHEMA)


@register(
    "audio_metadata_stats",
    f"""
SELECT fmt,
       COUNT(*) AS n_audio,
       CAST(SUM(sample_rate) AS BIGINT) AS sum_sr,
       CAST(SUM(n_samples) AS BIGINT) AS sum_samples,
       CAST(SUM(LENGTH(caption)) AS BIGINT) AS sum_caption_len
FROM (
  SELECT CASE WHEN doc_id % 7 = 0 AND doc_id > 0 THEN 'mp3' ELSE 'wav' END AS fmt,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         2048 + (doc_id * 37) % 4096 AS n_samples,
         SUBSTR(text, 1, 48) AS caption
  FROM documents WHERE doc_id < {N_MEDIA}
) GROUP BY fmt ORDER BY fmt
""",
)
def audio_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata aggregation over the audio table; the scan prunes the
    binary payload (tests/test_media.py asserts ReadSchema)."""
    return (
        audio_from_documents(spark, sf_dir)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_audio"),
            F.sum("sample_rate").alias("sum_sr"),
            F.sum("n_samples").alias("sum_samples"),
            F.sum(F.length("caption")).alias("sum_caption_len"),
        )
        .orderBy("fmt")
    )


@register(
    "video_metadata_stats",
    f"""
SELECT fmt,
       COUNT(*) AS n_video,
       CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
       CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
       CAST(SUM(fps) AS BIGINT) AS sum_fps
FROM (
  SELECT CASE WHEN doc_id % 11 = 0 AND doc_id > 0 THEN 'h264' ELSE 'rawv' END AS fmt,
         16 + doc_id % 17 AS w,
         16 + (doc_id * 5) % 17 AS h,
         8 + (doc_id % 5) * 4 AS fps,
         4 + doc_id % 13 AS n_frames
  FROM documents WHERE doc_id < {N_MEDIA}
) GROUP BY fmt ORDER BY fmt
""",
)
def video_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        video_from_documents(spark, sf_dir)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_video"),
            F.sum(F.col("w") * F.col("h")).alias("sum_pixels"),
            F.sum("n_frames").alias("sum_frames"),
            F.sum("fps").alias("sum_fps"),
        )
        .orderBy("fmt")
    )


@register(
    "audio_features_summary",
    f"""
    WITH a AS (
      SELECT d.doc_id,
             NOT (d.doc_id % 7 = 0 AND d.doc_id > 0) AS valid,
             2048 + (d.doc_id * 37) % 4096 AS n_samples,
             f.rms, f.zcr
      FROM documents d
      LEFT JOIN (VALUES {MF.values_sql(MF.AUDIO_FEATS)})
        f(did, n_win, rms, zcr) ON d.doc_id = f.did
      WHERE d.doc_id < {N_MEDIA}
    )
    SELECT valid, valid AS exact_match,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN valid THEN n_samples // 512 ELSE 0 END)
                AS BIGINT) AS sum_windows,
           CAST(SUM(CASE WHEN valid THEN rms ELSE 0 END) AS BIGINT)
                AS sum_rms_milli,
           CAST(SUM(CASE WHEN valid THEN zcr ELSE 0 END) AS BIGINT)
                AS sum_zcr_milli
    FROM a GROUP BY valid ORDER BY valid
    """,
)
def audio_features_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + validate + windowed features per payload, aggregated by
    validity: stub-decoder rows (mp3) surface as valid=false.

    Oracle: valid/exact_match and the windows-per-sample count are
    re-derived in SQL from the doc_id metadata formulas (windowing is
    ``n_samples // 512``); only the RMS/ZCR milli values — pure
    functions of doc_id — come from the pinned fixture
    (fixtures/media_feats.py, drift-guarded)."""
    feats = MD.audio_features(audio_from_documents(spark, sf_dir))
    return (
        feats.groupBy("valid", "exact_match")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_windows").alias("sum_windows"),
            F.sum("rms_mean_milli").alias("sum_rms_milli"),
            F.sum("zcr_milli").alias("sum_zcr_milli"),
        )
        .orderBy("valid", "exact_match")
    )


@register(
    "video_frame_sample_motion",
    f"""
    WITH v AS (
      SELECT d.doc_id,
             NOT (d.doc_id % 11 = 0 AND d.doc_id > 0) AS valid,
             4 + d.doc_id % 13 AS n_frames,
             f.luma, f.motion
      FROM documents d
      LEFT JOIN (VALUES {MF.values_sql(MF.VIDEO_FEATS)})
        f(did, n_sampled, luma, motion) ON d.doc_id = f.did
      WHERE d.doc_id < {N_MEDIA}
    )
    SELECT valid, valid AS exact_match,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN valid THEN (n_frames + 1) // 2 ELSE 0 END)
                AS BIGINT) AS sum_sampled,
           CAST(SUM(CASE WHEN valid THEN luma ELSE 0 END) AS BIGINT)
                AS sum_luma_milli,
           CAST(SUM(CASE WHEN valid THEN motion ELSE 0 END) AS BIGINT)
                AS sum_motion_milli
    FROM v GROUP BY valid ORDER BY valid
    """,
)
def video_frame_sample_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampled luminance/motion features, aggregated by validity;
    h264 rows exercise the stub path (valid=false).

    Oracle: valid/exact_match and the stride-2 sample count are
    re-derived in SQL from the doc_id metadata formulas
    (``(n_frames + 1) // 2``); only the luma/motion milli values —
    pure functions of doc_id — come from the pinned fixture."""
    feats = MD.video_features(video_from_documents(spark, sf_dir), frame_stride=2)
    return (
        feats.groupBy("valid", "exact_match")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_sampled").alias("sum_sampled"),
            F.sum("luma_mean_milli").alias("sum_luma_milli"),
            F.sum("motion_milli").alias("sum_motion_milli"),
        )
        .orderBy("valid", "exact_match")
    )
