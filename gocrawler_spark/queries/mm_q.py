"""Multimodal (image+caption) training-layout and alignment queries.

A vision-language training pipeline over the north-rule payload table
needs, beyond dedup/curation (image_pipeline_q), the LAYOUT and
ALIGNMENT stages:

- ``image_patch_tokens``: ViT-style token accounting per example —
  shorter-side resize to ``_TGT`` (aspect preserved, integer floor
  arithmetic), ``_PATCH``-pixel patchify, caption token count, total
  multimodal sequence length (patches + caption + BOS/SEP). Metadata
  arithmetic only — on a real parquet payload table the scan prunes
  the bytes column and reads just (w, h, caption); the synthetic
  source still renders payloads inside its mapInPandas, which is the
  source's cost, not this query's.
- ``multimodal_packing``: concat-and-chunk of those per-example
  sequence lengths into fixed ``_MM_SEQ_LEN``-token training sequences
  (the multimodal twin of text_q.sequence_packing): per sequence, how
  many examples it touches, its token fill, and how many examples
  cross a boundary. The global offset is the hierarchical two-pass
  prefix sum (operators/prefix.py), never a single-partition window.
- ``image_caption_alignment``: the CLIP-score-gate SHAPE — embed the
  pixels (decode → 16-dim integer grid feature, operators/images.py),
  embed the caption (feature-hashed bag of tokens into the same 16-dim
  integer space), score cosine(image, caption) in exact int64-until-
  the-last-float arithmetic, and keep/drop at a threshold. The caption
  embedder is a deterministic stand-in (md5 feature hashing) — a real
  CLIP text/image tower slots into the same two embedding columns —
  but the plumbing is the production shape: one decode map (bytes
  never shuffle), one row-local caption fold (no shuffle), one
  equijoin on image_id, row-local scoring.

Engine-exactness: every quantity is int64 until the single final
cosine float op (dot / sqrt(double(npix)*ncap) * 1e6, round half away
from zero), evaluated in the same order on both engines — the same
discipline as image_pipeline_q.image_embedding_near_dups. The pixel
features come from the pinned fixture (fixtures/image_feats.py) on the
oracle side and the real decode path on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions import text as TX
from gocrawler_spark.operators import images as IM
from gocrawler_spark.fixtures.image_feats import FEATS_VALUES_SQL
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.dedup_q import _md5_64, _md5_64_sql
from gocrawler_spark.queries.image_pipeline_q import _FCASE, _FCOLS
from gocrawler_spark.queries.image_q import (
    N_DOCS,
    images_from_documents,
    wh_case_sql,
)

_TGT = 224  # shorter-side resize target
_PATCH = 16  # ViT patch edge
_MM_SEQ_LEN = 4096  # multimodal packing window
_EXTRA_TOKENS = 2  # BOS + modality separator per example

# caption tokenization (lowercase, non-empty alnum runs) — identical
# split on both engines; caption = substr(text, 1, 64), the shared
# derivation from queries/image_q.py
_CAP_TOKS = (
    "list_filter(regexp_split_to_array(lower(caption), "
    "'[^\\p{L}\\p{N}]+'), x -> x <> '')"
)

# per-example ViT + caption token accounting, shared by both mm queries
_LENS_SQL = f"""
caps AS (
  SELECT doc_id AS did, substr(text, 1, 64) AS caption,
         {wh_case_sql("doc_id")}
  FROM documents WHERE doc_id < {N_DOCS}
),
sized AS (
  SELECT did, caption, w, h,
         (w * {_TGT}) // least(w, h) AS rw,
         (h * {_TGT}) // least(w, h) AS rh
  FROM caps
),
lens AS (
  SELECT did, rw, rh,
         CAST(((rw + {_PATCH - 1}) // {_PATCH})
              * ((rh + {_PATCH - 1}) // {_PATCH}) AS BIGINT) AS patch_tokens,
         CAST(len({_CAP_TOKS}) AS BIGINT) AS cap_tokens
  FROM sized
)
"""


def _example_lens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(image_id, rw, rh, patch_tokens, cap_tokens, seq_len) from the
    payload table's metadata columns — bytes pruned at the scan."""
    imgs = images_from_documents(spark, sf_dir).select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        "caption",
    )
    sized = imgs.select(
        "image_id",
        "caption",
        F.expr(f"w * {_TGT} DIV least(w, h)").alias("rw"),
        F.expr(f"h * {_TGT} DIV least(w, h)").alias("rh"),
    )
    return sized.select(
        "image_id",
        "rw",
        "rh",
        (
            F.expr(f"(rw + {_PATCH - 1}) DIV {_PATCH}")
            * F.expr(f"(rh + {_PATCH - 1}) DIV {_PATCH}")
        )
        .cast("long")
        .alias("patch_tokens"),
        F.size(TX.tokens_of(F.lower(F.col("caption"))))
        .cast("long")
        .alias("cap_tokens"),
    ).withColumn(
        "seq_len",
        (F.col("patch_tokens") + F.col("cap_tokens") + _EXTRA_TOKENS).cast(
            "long"
        ),
    )


@register(
    "image_patch_tokens",
    f"""
WITH {_LENS_SQL}
SELECT CAST(did AS BIGINT) AS image_id,
       CAST(rw AS BIGINT) AS rw, CAST(rh AS BIGINT) AS rh,
       patch_tokens, cap_tokens,
       CAST(patch_tokens + cap_tokens + {_EXTRA_TOKENS} AS BIGINT) AS seq_len
FROM lens
""",
)
def image_patch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-example multimodal token accounting: resized geometry,
    ViT patch count, caption token count, total sequence length."""
    return _example_lens(spark, sf_dir)


@register(
    "multimodal_packing",
    f"""
WITH {_LENS_SQL},
ex AS (
  SELECT did, patch_tokens + cap_tokens + {_EXTRA_TOKENS} AS n_tok
  FROM lens
),
spans AS (
  SELECT did, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(sum(n_tok) OVER (ORDER BY did
                               ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)
           AS start_tok
  FROM ex
),
exploded AS (
  SELECT did, n_tok, start_tok, s.seq_id
  FROM spans,
       LATERAL (SELECT unnest(range(start_tok // {_MM_SEQ_LEN},
                                    (start_tok + n_tok - 1)
                                      // {_MM_SEQ_LEN} + 1)) AS seq_id) s
)
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       count(*) AS n_examples,
       CAST(sum(least(start_tok + n_tok, (seq_id + 1) * {_MM_SEQ_LEN})
                - greatest(start_tok, seq_id * {_MM_SEQ_LEN})) AS BIGINT)
         AS n_tokens,
       CAST(sum(CASE WHEN start_tok < seq_id * {_MM_SEQ_LEN}
                      OR start_tok + n_tok > (seq_id + 1) * {_MM_SEQ_LEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_examples
FROM exploded
GROUP BY seq_id
""",
)
def multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of multimodal examples into fixed
    {_MM_SEQ_LEN}-token sequences, image_id order. Same two-pass
    prefix-sum offset layout as text_q.sequence_packing (every
    seq_len >= the 196-patch floor, so no zero-length filter is
    needed)."""
    from gocrawler_spark.operators.prefix import exclusive_prefix_sum

    ex = _example_lens(spark, sf_dir).select(
        "image_id", F.col("seq_len").alias("n_tok")
    )
    spans = exclusive_prefix_sum(ex, "image_id", "n_tok", "start_tok").select(
        "image_id", "n_tok", "start_tok"
    )
    L = _MM_SEQ_LEN
    exploded = spans.select(
        "n_tok",
        "start_tok",
        F.explode(
            F.sequence(
                F.expr(f"start_tok div {L}"),
                F.expr(f"(start_tok + n_tok - 1) div {L}"),
            )
        ).alias("seq_id"),
    )
    return (
        exploded.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.sum(
                F.least(F.col("start_tok") + F.col("n_tok"), (F.col("seq_id") + 1) * L)
                - F.greatest(F.col("start_tok"), F.col("seq_id") * L)
            )
            .cast("bigint")
            .alias("n_tokens"),
            F.sum(
                (
                    (F.col("start_tok") < F.col("seq_id") * L)
                    | (F.col("start_tok") + F.col("n_tok") > (F.col("seq_id") + 1) * L)
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_boundary_examples"),
        )
        .select("seq_id", "n_examples", "n_tokens", "n_boundary_examples")
    )


# ---------------------------------------------------------------------------
# CLIP-gate shape: cross-modal alignment score + keep verdict.
_ALIGN_THRESHOLD_MICRO = 0  # stand-in scorer is zero-centered


@register(
    "image_caption_alignment",
    f"""
WITH caps AS (
  SELECT doc_id AS did, substr(text, 1, 64) AS caption
  FROM documents WHERE doc_id < {N_DOCS}
),
feats AS (
  SELECT f.did, {_FCOLS}
  FROM (VALUES {FEATS_VALUES_SQL}) f(did, {_FCOLS})
  JOIN documents d ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
),
fv AS (
  SELECT did, dim.d AS dim, CAST(CASE dim.d {_FCASE} END AS BIGINT) AS v
  FROM feats, (SELECT unnest(range({IM.GRID_DIMS})) AS d) dim
),
ctoks AS (
  SELECT did, unnest({_CAP_TOKS}) AS t FROM caps
),
cw AS (
  SELECT did,
         {_md5_64_sql("'capdim/' || t")} % {IM.GRID_DIMS} AS dim,
         {_md5_64_sql("'capw/' || t")} % 2001 - 1000 AS wgt
  FROM ctoks
),
cvec AS (
  SELECT did, dim, CAST(sum(wgt) AS BIGINT) AS cv
  FROM cw GROUP BY did, dim
),
scored AS (
  SELECT fv.did,
         CAST(sum(fv.v * COALESCE(cv.cv, 0)) AS BIGINT) AS dot,
         CAST(sum(fv.v * fv.v) AS BIGINT) AS npix,
         CAST(sum(COALESCE(cv.cv, 0) * COALESCE(cv.cv, 0)) AS BIGINT) AS ncap
  FROM fv LEFT JOIN cvec cv ON cv.did = fv.did AND cv.dim = fv.dim
  GROUP BY fv.did
),
cos AS (
  SELECT did,
         CASE WHEN npix = 0 OR ncap = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(dot / sqrt(CAST(npix AS DOUBLE) * ncap) * 1e6)
                        AS BIGINT) END AS cos_micro
  FROM scored
)
SELECT CAST(did AS BIGINT) AS image_id, cos_micro,
       CAST(CASE WHEN cos_micro >= {_ALIGN_THRESHOLD_MICRO}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM cos
""",
)
def image_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-gate shape: pixel embedding (real decode →
    operators/images.grid_feature_vector) vs feature-hashed caption
    embedding in the same 16-dim integer space; cosine in micro units;
    keep/drop at the threshold. Decode is one map (bytes never
    shuffle); the caption fold is row-local column arithmetic; the only
    shuffle is the image_id equijoin between the two embedding sides."""
    D = IM.GRID_DIMS
    feats = IM.grid_features(images_from_documents(spark, sf_dir)).select(
        F.col("image_id").cast("long").alias("image_id"), "feat"
    )

    caps = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select(
            F.col("doc_id").alias("image_id"),
            F.substring("text", 1, 64).alias("caption"),
        )
    )
    toks = TX.tokens_of(F.lower(F.col("caption")))
    tw = F.transform(
        toks,
        lambda t: F.struct(
            (_md5_64(F.concat(F.lit("capdim/"), t)) % D).alias("dim"),
            (_md5_64(F.concat(F.lit("capw/"), t)) % 2001 - 1000).alias("wgt"),
        ),
    )
    zero = F.lit(0).cast("long")
    cvec = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda d: F.aggregate(
            tw,
            zero,
            lambda acc, s: acc
            + F.when(s["dim"] == d.cast("long"), s["wgt"]).otherwise(zero),
        ),
    )
    capvecs = caps.select("image_id", cvec.alias("cvec"))

    j = feats.join(capvecs, "image_id")
    dot = F.aggregate(
        F.zip_with("feat", "cvec", lambda a, b: a * b), zero, lambda a, x: a + x
    )
    npix = F.aggregate(
        F.zip_with("feat", "feat", lambda a, b: a * b), zero, lambda a, x: a + x
    )
    ncap = F.aggregate(
        F.zip_with("cvec", "cvec", lambda a, b: a * b), zero, lambda a, x: a + x
    )
    scored = j.select(
        "image_id",
        dot.alias("dot"),
        npix.alias("npix"),
        ncap.alias("ncap"),
    )
    cos_micro = (
        F.when((F.col("npix") == 0) | (F.col("ncap") == 0), F.lit(0))
        .otherwise(
            F.round(
                F.col("dot")
                / F.sqrt(F.col("npix").cast("double") * F.col("ncap"))
                * 1e6
            )
        )
        .cast("long")
    )
    out = scored.select("image_id", cos_micro.alias("cos_micro"))
    return out.select(
        "image_id",
        "cos_micro",
        (F.col("cos_micro") >= _ALIGN_THRESHOLD_MICRO)
        .cast("long")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cross-modal curation funnel: caption gate -> pixel gates -> model
# gate, one decode per payload, first-failing-reason attribution.
# ---------------------------------------------------------------------------

MMF_WC_FLOOR = 11  # caption word floor (corpus-calibrated)

from gocrawler_spark.fixtures.image_exposure import (  # noqa: E402
    EXPOSURE_VALUES_SQL as _MMF_EXP,
)
from gocrawler_spark.fixtures.image_probe import (  # noqa: E402
    PROBE_VALUES_SQL as _MMF_PROBE,
)
from gocrawler_spark.fixtures.image_sharp import (  # noqa: E402
    SHARP_VALUES_SQL as _MMF_SHARP,
)
from gocrawler_spark.queries.image_q import (  # noqa: E402
    BLUR_MILLI as _MMF_BLUR,
    BRIGHT_MILLI as _MMF_BRIGHT,
    DARK_MILLI as _MMF_DARK,
    FLAT_MILLI as _MMF_FLAT,
    KEEP_PROBE_MILLI as _MMF_KEEP,
    N_DOCS as _MMF_N,
)


@register(
    "multimodal_quality_funnel",
    f"""
    WITH sc AS (
      SELECT d.doc_id,
             length(list_filter(string_split(trim(substr(d.text, 1, 64)), ' '),
                                x -> x <> '')) AS wc,
             e.luma_milli, e.contrast_milli, s.lapvar_milli, p.score_milli
      FROM documents d
      JOIN (VALUES {_MMF_EXP}) e(did, luma_milli, contrast_milli, color_milli)
        ON d.doc_id = e.did
      JOIN (VALUES {_MMF_SHARP}) s(did, lapvar_milli) ON d.doc_id = s.did
      JOIN (VALUES {_MMF_PROBE}) p(did, score_milli) ON d.doc_id = p.did
      WHERE d.doc_id < {_MMF_N}
    )
    SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_images
    FROM (
      SELECT CASE
               WHEN wc < {MMF_WC_FLOOR} THEN 'caption_short'
               WHEN luma_milli < {_MMF_DARK} THEN 'dark'
               WHEN luma_milli > {_MMF_BRIGHT} THEN 'bright'
               WHEN contrast_milli < {_MMF_FLAT} THEN 'flat'
               WHEN lapvar_milli < {_MMF_BLUR} THEN 'blurry'
               WHEN score_milli < {_MMF_KEEP} THEN 'low_score'
               ELSE 'pass'
             END AS reason
      FROM sc
    ) GROUP BY reason ORDER BY reason
    """,
)
def multimodal_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LAION-style curation funnel across all three
    modalities of evidence — caption text (word floor), pixels
    (dark/bright/flat/blurry), model score (inference keep gate) —
    with first-failing-reason attribution, and ONE decode per payload:
    a single mapInPandas computes exposure, sharpness, and the
    resized-tensor probe score from the same decoded array (at 100 TB
    decode dominates; three gate families must not cost three decode
    passes). The caption gate runs JVM-side on the caption column
    (split/trim/filter are codegen'd); only (reason) reaches the
    shuffle.

    Oracle: all three per-payload score families are pure functions of
    doc_id (pinned fixtures, independently regenerated); the caption
    word count and the CASE chain are restated relationally."""
    import numpy as np
    import pandas as pd

    from gocrawler_spark.operators import inference as INF
    from gocrawler_spark.queries.image_q import images_from_documents

    def score_all(batches):
        from gocrawler_spark.sources import synthetic_images as SI

        W = INF.probe_weights(*INF.PROBE_HW)
        th, tw = INF.PROBE_HW
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = SI.decode_image(bytes(r.bytes), r.fmt)
                lm, cm, _ = IM.exposure_stats_milli(px)
                lap = IM.laplacian_sharpness_milli(px)
                yi = (np.arange(th) * px.shape[0]) // th
                xi = (np.arange(tw) * px.shape[1]) // tw
                t = px[yi][:, xi].astype(np.int64)
                score = int((t * W).sum()) * 1000 // (th * tw * 3)
                rows.append((r.image_id, lm, cm, lap, score))
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "luma_milli", "contrast_milli",
                    "lapvar_milli", "score_milli",
                ],
            )

    imgs = images_from_documents(spark, sf_dir)
    scored = imgs.select("image_id", "bytes", "fmt").mapInPandas(
        score_all,
        "image_id string, luma_milli long, contrast_milli long, "
        "lapvar_milli long, score_milli long",
    )
    # caption word count straight from documents — the caption IS
    # substr(text, 1, 64) (images_from_documents) and image_id IS
    # str(doc_id), so reading it through `imgs` again would trigger a
    # SECOND full render/encode materialization just for a text
    # column, defeating this query's own one-decode-per-payload point.
    # (The oracle derives wc the same way.)
    wc = F.size(
        F.filter(
            F.split(F.trim(F.substring("text", 1, 64)), " "),
            lambda x: x != "",
        )
    )
    caps = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _MMF_N)
        .select(F.col("doc_id").cast("string").alias("image_id"), wc.alias("wc"))
    )
    # thresholds: the SAME _MMF_* aliases the SQL oracle interpolates —
    # a second import set under different names could desynchronize
    # oracle and engine silently
    reason = (
        F.when(F.col("wc") < MMF_WC_FLOOR, "caption_short")
        .when(F.col("luma_milli") < _MMF_DARK, "dark")
        .when(F.col("luma_milli") > _MMF_BRIGHT, "bright")
        .when(F.col("contrast_milli") < _MMF_FLAT, "flat")
        .when(F.col("lapvar_milli") < _MMF_BLUR, "blurry")
        .when(F.col("score_milli") < _MMF_KEEP, "low_score")
        .otherwise("pass")
        .alias("reason")
    )
    return (
        scored.join(caps, "image_id")
        .select(reason)
        .groupBy("reason")
        .agg(F.count("*").alias("n_images"))
        .orderBy("reason")
    )
