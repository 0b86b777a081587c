"""Image payload queries (graft axis — BASELINE.json input_hint).

The driver testdata has no image table, so these queries DERIVE one
deterministically from ``documents``: metadata (w, h, fmt, caption)
via SQL-expressible arithmetic on ``doc_id`` (so the metadata query
has a real DuckDB oracle), pixels/bytes via the pure-function render.
Because the pixels are a pure function of doc_id, the phash column is
too — its 300 values are pinned as a VALUES fixture
(fixtures/image_phash.py), which upgrades the phash LSH queries to
full DuckDB oracles; only the queries that DECODE payload bytes
inside the check (validate / resize round-trip) remain rows-only.

Derivations (both sides compute these identically):
    w    = 16 + doc_id % 49
    h    = 16 + (doc_id * 7) % 49
    fmt  = 'qjpg' if doc_id % 3 == 0 else 'png'
    caption = substr(text, 1, 64)
    near-dup twins: doc_id % 5 == 1 renders the PIXELS of doc_id - 1
      (lossy re-encode) → known near-duplicate pairs for phash LSH.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.fixtures import media_feats as MF
from gocrawler_spark.fixtures.image_phash import PHASH_VALUES_SQL
from gocrawler_spark.fixtures.jpeg_roundtrip import (
    N_JPEG,
    ROUNDTRIP_VALUES_SQL as JPEG_ROUNDTRIP_VALUES_SQL,
)
from gocrawler_spark.fixtures.image_exposure import EXPOSURE_VALUES_SQL
from gocrawler_spark.fixtures.image_probe import PROBE_VALUES_SQL
from gocrawler_spark.fixtures.image_sharp import SHARP_VALUES_SQL
from gocrawler_spark.operators import images as IM
from gocrawler_spark.operators import inference as INF
from gocrawler_spark.plans import image_store as IST
from gocrawler_spark.queries import load, register
from gocrawler_spark.sources import synthetic_images as SI

N_DOCS = 300  # doc_id < N_DOCS exists at every sf

# The phash column is a pure function of doc_id (see module docstring),
# pinned as a VALUES fixture (fixtures/image_phash.py, drift-guarded by
# tests/test_images.py) and joined against documents so only doc_ids
# present at the current scale factor materialize — this makes the LSH
# banding / Hamming logic itself oracle-checkable in SQL.
PHASH_SQL = f"""
ph AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS image_id, d.doc_id AS did, f.phash
  FROM documents d JOIN (VALUES {PHASH_VALUES_SQL}) f(did, phash)
    ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
)
"""


def wh_case_sql(ref: str = "doc_id") -> str:
    """SQL fragment deriving the synthetic ``w, h`` columns from a
    doc-id expression, including the %5==1 near-dup-twin rule (the twin
    renders the PREVIOUS doc's pixels, so it inherits that doc's
    dimensions — see module docstring). Shared by every oracle that
    re-derives image metadata so the derivation lives in one place."""
    return f"""CASE WHEN {ref} % 5 = 1 AND {ref} > 0
                  THEN 16 + ({ref} - 1) % 49 ELSE 16 + {ref} % 49 END AS w,
             CASE WHEN {ref} % 5 = 1 AND {ref} > 0
                  THEN 16 + (({ref} - 1) * 7) % 49
                  ELSE 16 + ({ref} * 7) % 49 END AS h"""


def images_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", F.substring("text", 1, 64).alias("caption"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                w = 16 + d % 49
                h = 16 + (d * 7) % 49
                fmt = "qjpg" if d % 3 == 0 else "png"
                # near-dup twin: render the previous doc's pixels
                render_id = str(d - 1) if (d % 5 == 1 and d > 0) else str(d)
                if d % 5 == 1 and d > 0:
                    p = d - 1
                    w, h = 16 + p % 49, 16 + (p * 7) % 49
                px = SI.render_pixels(render_id, w, h)
                data = SI.encode_png(px) if fmt == "png" else SI.encode_qjpg(px)
                rows.append(
                    {
                        "image_id": str(d),
                        "bytes": data,
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": r.caption,
                        "phash": SI.ahash64(SI.decode_image(data, fmt)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return docs.mapInPandas(gen, IM.IMAGE_SCHEMA)


@register(
    "jpeg_codec_roundtrip",
    f"""
    SELECT CAST(d.doc_id AS VARCHAR) AS image_id,
           CAST(16 + d.doc_id % 49 AS INT) AS w,
           CAST(16 + (d.doc_id * 7) % 49 AS INT) AS h,
           CAST(f.bytes_len AS BIGINT) AS bytes_len,
           CAST(f.psnr_milli AS BIGINT) AS psnr_milli,
           f.psnr_milli >= 40000 AS psnr_ok
    FROM documents d
    JOIN (VALUES {JPEG_ROUNDTRIP_VALUES_SQL}) f(did, bytes_len, psnr_milli)
      ON d.doc_id = f.did
    WHERE d.doc_id < {N_JPEG}
    """,
)
def jpeg_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG through the payload chain (round-5): one
    ITU-T T.81 JFIF payload per doc (functions/jpeg.py — the same
    codec the fmt='jpg' decode seam falls back to, interop-pinned
    against third-party encoders in tests/test_jpeg_codec.py),
    encode → decode → PSNR computed inside mapInPandas workers. The
    oracle joins the pinned per-doc constants (payload size, PSNR)
    against documents and re-derives dims + the input_hint 40 dB gate
    in SQL, so any drift in DCT/quantization/Huffman/color math fails
    the driver's value hash."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_JPEG)
        .select("doc_id")
    )

    def rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gocrawler_spark.functions import jpeg as J

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.doc_id)
                w, h = 16 + d % 49, 16 + (d * 7) % 49
                px = SI.render_pixels(str(d), w, h)
                data = J.encode_baseline_jpeg(px)
                psnr = SI.psnr_db(px, SI.decode_image(data, "jpg"))
                rows.append(
                    {
                        "image_id": str(d),
                        "w": w,
                        "h": h,
                        "bytes_len": len(data),
                        "psnr_milli": int(round(psnr * 1000)),
                        "psnr_ok": bool(round(psnr * 1000) >= 40000),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "bytes_len", "psnr_milli", "psnr_ok",
                ],
            )

    return docs.mapInPandas(
        rt,
        "image_id string, w int, h int, bytes_len long, "
        "psnr_milli long, psnr_ok boolean",
    )


@register(
    "image_metadata_stats",
    f"""
    SELECT fmt,
           COUNT(*) AS n_images,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(h) AS BIGINT) AS sum_h,
           CAST(SUM(LENGTH(caption)) AS BIGINT) AS sum_caption_len
    FROM (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
             {wh_case_sql("doc_id")},
             SUBSTR(text, 1, 64) AS caption
      FROM documents WHERE doc_id < {N_DOCS}
    ) GROUP BY fmt ORDER BY fmt
    """,
)
def image_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata aggregation over the image table; the scan must prune
    the binary payload column (verified in tests/test_images.py)."""
    return (
        images_from_documents(spark, sf_dir)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("w").alias("sum_w"),
            F.sum("h").alias("sum_h"),
            F.sum(F.length("caption")).alias("sum_caption_len"),
        )
        .orderBy("fmt")
    )


@register(
    "image_validate_summary",
    f"""
    WITH base AS (
      SELECT doc_id FROM documents
      WHERE doc_id < {N_DOCS} AND NOT (doc_id % 5 = 1 AND doc_id > 0)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) AS BIGINT) AS n_decode_ok,
           CAST(COUNT(*) AS BIGINT) AS n_dims_ok,
           CAST(COUNT(*) AS BIGINT) AS n_pixels_ok,
           CAST(COUNT(*) AS BIGINT) AS n_phash_ok,
           (SELECT CAST(MIN(f.psnr_milli) AS BIGINT)
              FROM (VALUES {MF.values_sql(MF.VALIDATE_PSNR)}) f(did, psnr_milli)
              JOIN base b ON b.doc_id = f.did) AS min_lossy_psnr_milli,
           CAST(COUNT(*) AS BIGINT) AS n_caption_ok
    FROM base
    """,
)
def image_validate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint invariant over the derived table: every row must
    decode, match the reference render (exact / PSNR>=40dB), keep its
    caption byte-equal through the pipeline, and recompute its phash.

    Oracle: the flags are invariants (every non-twin row passes — the
    fixture regen asserts this), so the counts reduce to COUNT(*) over
    the same doc_id predicate; the only non-SQL value, the lossy PSNR,
    is a pure function of doc_id pinned in fixtures/media_feats.py
    (drift-guarded by tests/test_media_fixtures.py)."""
    # twins (doc_id % 5 == 1) intentionally carry another id's pixels
    # for the near-dup query — exclude them from the id→render check
    imgs = images_from_documents(spark, sf_dir).filter(
        ~((F.col("image_id").cast("long") % 5 == 1) & (F.col("image_id").cast("long") > 0))
    )
    v = IM.validate_images(imgs)
    cap_ref = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.substring("text", 1, 64).alias("cap_expected"),
        )
    )
    # cross-table caption check folded into the same job: broadcast-join the
    # expected captions onto the per-row validation output and aggregate once.
    cap_flags = (
        imgs.select("image_id", "caption")
        .join(F.broadcast(cap_ref), "image_id", "left")
        .select(
            "image_id",
            (F.col("caption") == F.col("cap_expected")).cast("long").alias("cap_ok"),
        )
    )
    return (
        v.join(cap_flags, "image_id", "left")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_decode_ok"),
            F.sum(F.col("dims_ok").cast("long")).alias("n_dims_ok"),
            F.sum(F.col("pixels_ok").cast("long")).alias("n_pixels_ok"),
            F.sum(F.col("phash_ok").cast("long")).alias("n_phash_ok"),
            F.min(F.floor(F.col("psnr_db") * 1e3)).alias("min_lossy_psnr_milli"),
            F.sum(F.coalesce(F.col("cap_ok"), F.lit(0))).alias("n_caption_ok"),
        )
    )


@register(
    "image_phash_near_dups",
    f"""
    WITH {PHASH_SQL},
    bands AS (
      SELECT image_id, phash, b.band_id,
             (phash >> (b.band_id * 16)) & 65535 AS band_value
      FROM ph CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_id) b
    ),
    cand AS (
      SELECT DISTINCT l.image_id AS a_id, r.image_id AS b_id,
             l.phash AS pa, r.phash AS pb
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_value = r.band_value
      WHERE l.image_id < r.image_id
    )
    SELECT a_id, b_id, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= 3
    ORDER BY a_id, b_id
    """,
)
def image_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH perceptual near-dup pairs; the twin construction
    (doc_id % 5 == 1 re-renders doc_id-1 lossily) guarantees known
    pairs, verified in tests. The oracle pins the pixel-derived phash
    values (pure function of doc_id — fixtures/image_phash.py) and
    independently re-expresses the banding + Hamming verification in
    SQL; arithmetic `>>` then `& 65535` equals the engine's
    shiftright+mask band extraction for every band offset."""
    imgs = images_from_documents(spark, sf_dir)
    return IM.phash_near_dups(imgs, max_hamming=3).orderBy("a_id", "b_id")


@register(
    "image_resize_summary",
    f"""
    SELECT TRUE AS dims_ok, TRUE AS phash_ok,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(f.pixel_sum) AS BIGINT) AS sum_pixels
    FROM (VALUES {MF.values_sql(MF.RESIZE_PIXSUM)}) f(did, pixel_sum)
    JOIN documents d ON d.doc_id = f.did
    WHERE d.doc_id < {N_DOCS}
    """,
)
def image_resize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize to 24x24 → re-encode → verify
    round-trip decodability, aggregated: every output must have the
    target dims and its re-encoded PNG must decode back bit-equal.

    Oracle: the round-trip flags are invariants (asserted during
    fixture regen), collapsing the group-by to the single (true, true)
    row; the resized pixel sums are pure functions of doc_id pinned in
    fixtures/media_feats.py."""
    import numpy as np

    resized = IM.resize_images(images_from_documents(spark, sf_dir), 24, 24)

    def check(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = SI.decode_image(bytes(r.bytes), r.fmt)
                rows.append(
                    (
                        r.image_id,
                        px.shape == (24, 24, 3),
                        SI.ahash64(px) == r.phash,
                        int(px.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "dims_ok", "phash_ok", "pixel_sum"]
            )

    checked = resized.mapInPandas(
        check, "image_id string, dims_ok boolean, phash_ok boolean, pixel_sum long"
    )
    return (
        checked.groupBy("dims_ok", "phash_ok")
        .agg(F.count("*").alias("n"), F.sum("pixel_sum").alias("sum_pixels"))
        .orderBy("dims_ok", "phash_ok")
    )


BLUR_MILLI = 20_000_000  # variance-of-Laplacian 20000: blur gate


@register(
    "image_sharpness_stats",
    f"""
    SELECT fmt,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(CASE WHEN lapvar_milli < {BLUR_MILLI} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_blurry,
           CAST(SUM(lapvar_milli) AS BIGINT) AS sum_lapvar_milli,
           CAST(MIN(lapvar_milli) AS BIGINT) AS min_lapvar_milli,
           CAST(MAX(lapvar_milli) AS BIGINT) AS max_lapvar_milli
    FROM (
      SELECT CASE WHEN d.doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
             f.lapvar_milli
      FROM documents d JOIN (VALUES {SHARP_VALUES_SQL}) f(did, lapvar_milli)
        ON d.doc_id = f.did
      WHERE d.doc_id < {N_DOCS}
    ) GROUP BY fmt ORDER BY fmt
    """,
)
def image_sharpness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blur detection over the image table: decode → integer
    variance-of-Laplacian (operators/images.laplacian_sharpness_milli)
    → per-format quality stats with a blur-gate count. The scoring is
    a pure map (payload bytes stay in their partition); only
    (fmt, int64) reaches the shuffle.

    Oracle: sharpness is a pure function of doc_id on the derived
    table, pinned as a VALUES fixture (fixtures/image_sharp.py,
    regenerated by an independent NAIVE per-pixel loop and
    drift-guarded by tests/test_images.py); the SQL re-derives fmt
    and restates the blur gate + aggregation relationally."""
    scored = IM.score_sharpness(images_from_documents(spark, sf_dir))
    return (
        scored.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum((F.col("lapvar_milli") < BLUR_MILLI).cast("long")).alias("n_blurry"),
            F.sum("lapvar_milli").alias("sum_lapvar_milli"),
            F.min("lapvar_milli").alias("min_lapvar_milli"),
            F.max("lapvar_milli").alias("max_lapvar_milli"),
        )
        .orderBy("fmt")
    )


# Exposure gates, calibrated to the synthetic corpus so every verdict
# fires (the renders are mid-exposure by construction; a natural-image
# deployment retunes these four constants, nothing else).
DARK_MILLI = 105_000      # mean luminance floor (0..255000 scale)
BRIGHT_MILLI = 112_000    # mean luminance ceiling
FLAT_MILLI = 14_000_000   # luminance-variance (contrast) floor


@register(
    "image_exposure_stats",
    f"""
    SELECT fmt,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(luma_milli) AS BIGINT) AS sum_luma_milli,
           CAST(SUM(contrast_milli) AS BIGINT) AS sum_contrast_milli,
           CAST(SUM(color_milli) AS BIGINT) AS sum_color_milli,
           CAST(MIN(luma_milli) AS BIGINT) AS min_luma_milli,
           CAST(MAX(luma_milli) AS BIGINT) AS max_luma_milli
    FROM (
      SELECT CASE WHEN d.doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
             f.luma_milli, f.contrast_milli, f.color_milli
      FROM documents d
      JOIN (VALUES {EXPOSURE_VALUES_SQL}) f(did, luma_milli, contrast_milli, color_milli)
        ON d.doc_id = f.did
      WHERE d.doc_id < {N_DOCS}
    ) GROUP BY fmt ORDER BY fmt
    """,
)
def image_exposure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format exposure statistics: decode → one-pass integer
    (luma, contrast, colorfulness) — operators/images.exposure_stats_milli
    — aggregated per format. Pure map; only (fmt, 3×int64) shuffles.

    Oracle: the triple is a pure function of doc_id on the derived
    table, pinned in fixtures/image_exposure.py (independent naive
    per-pixel regen, drift-guarded by tests/test_images.py)."""
    scored = IM.score_exposure(images_from_documents(spark, sf_dir))
    return (
        scored.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("luma_milli").alias("sum_luma_milli"),
            F.sum("contrast_milli").alias("sum_contrast_milli"),
            F.sum("color_milli").alias("sum_color_milli"),
            F.min("luma_milli").alias("min_luma_milli"),
            F.max("luma_milli").alias("max_luma_milli"),
        )
        .orderBy("fmt")
    )


@register(
    "image_quality_funnel",
    f"""
    SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(lapvar_milli) AS BIGINT) AS sum_lapvar_milli
    FROM (
      SELECT CASE
               WHEN e.luma_milli < {DARK_MILLI} THEN 'dark'
               WHEN e.luma_milli > {BRIGHT_MILLI} THEN 'bright'
               WHEN e.contrast_milli < {FLAT_MILLI} THEN 'flat'
               WHEN s.lapvar_milli < {BLUR_MILLI} THEN 'blurry'
               ELSE 'pass'
             END AS reason,
             s.lapvar_milli
      FROM documents d
      JOIN (VALUES {EXPOSURE_VALUES_SQL}) e(did, luma_milli, contrast_milli, color_milli)
        ON d.doc_id = e.did
      JOIN (VALUES {SHARP_VALUES_SQL}) s(did, lapvar_milli)
        ON d.doc_id = s.did
      WHERE d.doc_id < {N_DOCS}
    ) GROUP BY reason ORDER BY reason
    """,
)
def image_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style pixel-quality funnel with first-failing-reason
    accounting: each image is gated dark → bright → flat → blurry →
    pass, and the funnel reports per-reason counts. BOTH per-image
    scores come out of ONE decode pass (a single mapInPandas computes
    exposure + sharpness per payload — at 100 TB you never decode an
    image twice for two quality gates); the verdict chain itself is a
    codegen'd CASE column, and only (reason, int64) reaches the
    shuffle.

    Oracle: exposure + sharpness are pure functions of doc_id (pinned
    fixtures, independently regen'd), the gate chain restated as SQL
    CASE over the joined fixtures."""

    def score_both(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = SI.decode_image(bytes(r.bytes), r.fmt)
                lm, cm, _co = IM.exposure_stats_milli(px)
                rows.append(
                    (r.image_id, lm, cm, IM.laplacian_sharpness_milli(px))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "luma_milli", "contrast_milli", "lapvar_milli"],
            )

    scored = images_from_documents(spark, sf_dir).select(
        "image_id", "bytes", "fmt"
    ).mapInPandas(
        score_both,
        "image_id string, luma_milli long, contrast_milli long, lapvar_milli long",
    )
    reason = (
        F.when(F.col("luma_milli") < DARK_MILLI, "dark")
        .when(F.col("luma_milli") > BRIGHT_MILLI, "bright")
        .when(F.col("contrast_milli") < FLAT_MILLI, "flat")
        .when(F.col("lapvar_milli") < BLUR_MILLI, "blurry")
        .otherwise("pass")
        .alias("reason")
    )
    return (
        scored.select(reason, "lapvar_milli")
        .groupBy("reason")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("lapvar_milli").alias("sum_lapvar_milli"),
        )
        .orderBy("reason")
    )


KEEP_PROBE_MILLI = -10_000  # probe-score keep gate (corpus-calibrated)


@register(
    "image_model_scores",
    f"""
    SELECT fmt,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(CASE WHEN score_milli >= {KEEP_PROBE_MILLI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli,
           CAST(MIN(score_milli) AS BIGINT) AS min_score_milli,
           CAST(MAX(score_milli) AS BIGINT) AS max_score_milli
    FROM (
      SELECT CASE WHEN d.doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
             f.score_milli
      FROM documents d
      JOIN (VALUES {PROBE_VALUES_SQL}) f(did, score_milli)
        ON d.doc_id = f.did
      WHERE d.doc_id < {N_DOCS}
    ) GROUP BY fmt ORDER BY fmt
    """,
)
def image_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference over the image table: decode → resize
    to the model input (24×24) → accumulate into fixed-size stacked
    tensors ACROSS Arrow batches → score each stack with the pluggable
    model_fn (operators/inference.infer_batched; deterministic integer
    linear probe standing in for an NSFW/aesthetic tower) → per-format
    keep-gate stats. Payload bytes never shuffle; the device batch
    size is decoupled from Arrow's batch boundary.

    Oracle: the probe score is a pure function of doc_id on the
    derived table, pinned in fixtures/image_probe.py (independent
    naive triple-loop regen, drift-guarded by tests/test_inference.py)."""
    imgs = images_from_documents(spark, sf_dir)
    # fmt is a pure function of the id (module docstring) — derive it
    # instead of joining the image table back on itself, which would
    # re-run the payload materialization and add a shuffle.
    scored = INF.infer_batched(imgs, batch_size=64).withColumn(
        "fmt",
        F.when(F.col("image_id").cast("long") % 3 == 0, "qjpg").otherwise("png"),
    )
    return (
        scored.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(
                (F.col("score_milli") >= KEEP_PROBE_MILLI).cast("long")
            ).alias("n_keep"),
            F.sum("score_milli").alias("sum_score_milli"),
            F.min("score_milli").alias("min_score_milli"),
            F.max("score_milli").alias("max_score_milli"),
        )
        .orderBy("fmt")
    )


@register(
    "image_byte_dedup",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_distinct_payloads,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_rows,
           CAST(1 + MAX(is_dup) AS BIGINT) AS max_group_size,
           CAST(SUM(CASE WHEN is_dup = 1 THEN doc_id - 1 ELSE 0 END)
                AS BIGINT) AS sum_dup_canonical_ids
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 1 AND doc_id > 0 AND doc_id % 3 = 2
                  THEN 1 ELSE 0 END AS is_dup
      FROM documents WHERE doc_id < {N_DOCS}
    )
    """,
)
def image_byte_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact storage-level dedup over the image table: sha256 the
    payload JVM-side (F.sha2 — zero Python in the hot path), group,
    first-wins canonical = lowest id per group. Complements the phash
    NEAR-dup path: at 100 TB this is the cheap pass that collapses
    byte-identical re-crawls/mirrors before any decode happens, and
    the only shuffled data is (32-byte digest, id) — never payloads.

    Oracle: byte-identical groups follow from the derivation in
    closed form — the %5==1 twin re-renders doc_id-1's pixels, the
    codecs are deterministic, so bytes collide iff the formats also
    match (both png ⇔ doc_id % 3 = 2, since (doc_id-1) % 3 = 1 ≠ 0);
    verified exhaustively in tests/test_images.py. The canonical-id
    sum pins the first-wins choice, not just the group count."""
    groups = (
        images_from_documents(spark, sf_dir)
        .select(
            F.col("image_id").cast("long").alias("iid"),
            F.sha2(F.col("bytes"), 256).alias("sha"),
        )
        .groupBy("sha")
        .agg(F.count("*").alias("n"), F.min("iid").alias("canon"))
    )
    return groups.agg(
        F.sum("n").alias("n_images"),
        F.count("*").alias("n_distinct_payloads"),
        F.sum(F.col("n") - 1).alias("n_dup_rows"),
        F.max("n").alias("max_group_size"),
        F.sum(F.when(F.col("n") > 1, F.col("canon")).otherwise(0)).alias(
            "sum_dup_canonical_ids"
        ),
    )


@register(
    "image_bucketed_enrich",
    f"""
    SELECT fmt, keep,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli,
           CAST(SUM(w) AS BIGINT) AS sum_w
    FROM (
      SELECT CASE WHEN d.doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
             f.score_milli >= {KEEP_PROBE_MILLI} AS keep,
             f.score_milli,
             {wh_case_sql("d.doc_id")}
      FROM documents d
      JOIN (VALUES {PROBE_VALUES_SQL}) f(did, score_milli)
        ON d.doc_id = f.did
      WHERE d.doc_id < {N_DOCS}
    ) GROUP BY fmt, keep ORDER BY fmt, keep
    """,
)
def image_bucketed_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-store pipeline under the oracle gate: write the
    payload table bucketed by image_id (plans/image_store.py — the
    Parquet stand-in for Iceberg bucket(N, image_id)), derive the
    inference-score enrichment by scanning payloads IN PLACE, write it
    bucket-aligned, then join payloads ⋈ scores payload-locally (zero
    Exchange when both sides are non-broadcastable — plan-asserted in
    tests/test_image_store.py) and aggregate the keep-gate per format.

    Oracle: probe scores pinned (fixtures/image_probe.py), w re-derived
    arithmetically — the relational shape restated over the fixtures."""
    store = IST.ImageStore(spark, name="q_image_store", n_buckets=8)
    store.write_payloads(images_from_documents(spark, sf_dir))
    store.write_enrichment(
        INF.infer_batched(store.payloads(), batch_size=64), "scores"
    )
    return (
        store.enrich("scores")
        .groupBy(
            "fmt", (F.col("score_milli") >= KEEP_PROBE_MILLI).alias("keep")
        )
        .agg(
            F.count("*").alias("n_images"),
            F.sum("score_milli").alias("sum_score_milli"),
            F.sum("w").alias("sum_w"),
        )
        .orderBy("fmt", "keep")
    )
