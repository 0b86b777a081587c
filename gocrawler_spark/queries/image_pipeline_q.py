"""Image+caption training-data pipeline queries (graft axis).

The north_rule input is an image+caption pair table; a 100 TB curation
pipeline over that table needs caption-level dedup and cross-modal
contamination checks in addition to the pixel-level ops in image_q:

- ``image_caption_dedup``: exact caption dedup — normalize the caption
  (lowercase, trim, collapse whitespace) and keep the first image per
  normalized caption ("first wins" by numeric id, the reference's P5
  rule applied to captions, crawler.go:1248-1255). SQL-expressible on
  the shared metadata derivation, so it has a full DuckDB oracle.
- ``caption_decontaminate``: cross-modal contamination — which TEXT
  documents contain analyzer 3-gram shingles from some OTHER image's
  caption. The eval-decontamination sweep with captions as the held-out
  side; self-matches (a caption is a prefix of its own source doc) are
  excluded at the shingle join. Full DuckDB oracle.
- ``image_dedup_clusters``: connected components over the union of
  pixel evidence (phash banded-LSH pairs) and caption evidence (exact
  normalized-caption groups as star edges). Full DuckDB oracle: the
  pixel-derived phash values are pinned as a VALUES fixture
  (fixtures/image_phash.py — phash is a pure function of doc_id) and
  the banding + Hamming + recursive-CTE components are re-expressed in
  SQL; cluster structure (twins join their originals) is additionally
  unit-tested in tests/test_image_pipeline.py.

Caption derivation matches queries/image_q.py exactly:
caption = substr(text, 1, 64) for doc_id < N_DOCS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.functions import text as TX
from gocrawler_spark.operators import images as IM
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.crawler_q import CFG, STOP_RX, TOKS_SQL
from gocrawler_spark.queries.dedup_q import SHINGLE_N, _md5_64_sql, _round_half_away
from gocrawler_spark.fixtures.image_feats import FEATS_VALUES_SQL
from gocrawler_spark.fixtures.image_phash import PHASH_VALUES_SQL
from gocrawler_spark.queries.image_q import (
    N_DOCS,
    PHASH_SQL,
    images_from_documents,
    wh_case_sql,
)
from gocrawler_spark.queries.pipeline_q import connected_components

# Shared caption derivation (both engines): images exist for
# doc_id < N_DOCS; caption = first 64 chars of the source doc's text.
_CAPTIONS_SQL = f"""
captions AS (
  SELECT doc_id AS image_id, substr(text, 1, 64) AS caption
  FROM documents WHERE doc_id < {N_DOCS}
)
"""

# caption normalization: lowercase, trim, collapse internal whitespace
_NORM_SQL = "regexp_replace(lower(trim(caption)), '\\s+', ' ', 'g')"


def _norm_caption(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


@register(
    "image_caption_dedup",
    f"""
WITH {_CAPTIONS_SQL},
normed AS (
  SELECT image_id, {_NORM_SQL} AS caption_norm FROM captions
),
groups AS (
  SELECT image_id, caption_norm,
         min(image_id) OVER (PARTITION BY caption_norm) AS canonical_id,
         count(*) OVER (PARTITION BY caption_norm) AS group_size
  FROM normed
)
SELECT CAST(image_id AS VARCHAR) AS image_id,
       CAST(canonical_id AS VARCHAR) AS canonical_id,
       CAST(group_size AS BIGINT) AS group_size,
       CAST(image_id = canonical_id AS BIGINT) AS is_canonical
FROM groups
""",
)
def image_caption_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact caption dedup over the image+caption table: first image
    (lowest numeric id) per normalized caption is canonical, the rest
    are drops.

    Scale: one shuffle on the normalized-caption key (window =
    partial-agg min/count per group). At 100 TB replace the raw
    caption key with its xxhash64 to shrink shuffle width — the
    grouping is unchanged. A boilerplate caption ("no caption") makes
    a hot key; the min/count window stays a two-phase partial agg, so
    skew costs bandwidth, not correctness — salt the partial agg if a
    single caption dominates."""
    caps = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select(
            F.col("doc_id").alias("iid"),
            _norm_caption(F.substring("text", 1, 64)).alias("caption_norm"),
        )
    )
    w = Window.partitionBy("caption_norm")
    g = caps.select(
        "iid",
        F.min("iid").over(w).alias("canon"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )
    return g.select(
        F.col("iid").cast("string").alias("image_id"),
        F.col("canon").cast("string").alias("canonical_id"),
        F.col("group_size").cast("long").alias("group_size"),
        (F.col("iid") == F.col("canon")).cast("long").alias("is_canonical"),
    )


@register(
    "caption_decontaminate",
    f"""
WITH {_CAPTIONS_SQL},
cap_toks AS (
  SELECT image_id,
         list_filter({TOKS_SQL.replace("lower(text)", "lower(caption)")},
                     t -> NOT regexp_matches(t, '{STOP_RX}')) AS L
  FROM captions
),
cap_shingles AS (
  SELECT DISTINCT image_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS shingle
  FROM (SELECT image_id, L, unnest(range(1, len(L) - 1)) AS i
        FROM cap_toks WHERE len(L) >= {SHINGLE_N})
),
doc_toks AS (
  SELECT doc_id,
         list_filter({TOKS_SQL}, t -> NOT regexp_matches(t, '{STOP_RX}')) AS L
  FROM documents
),
doc_shingles AS (
  SELECT DISTINCT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS shingle
  FROM (SELECT doc_id, L, unnest(range(1, len(L) - 1)) AS i
        FROM doc_toks WHERE len(L) >= {SHINGLE_N})
),
hits AS (
  SELECT d.doc_id, count(DISTINCT d.shingle) AS n
  FROM doc_shingles d JOIN cap_shingles c USING (shingle)
  WHERE c.image_id <> d.doc_id
  GROUP BY d.doc_id
),
docs AS (SELECT DISTINCT doc_id FROM doc_shingles)
SELECT t.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared,
       CAST(COALESCE(h.n, 0) > 0 AS BIGINT) AS contaminated
FROM docs t LEFT JOIN hits h USING (doc_id)
""",
)
def caption_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal decontamination: per text document, the number of
    distinct analyzer 3-gram shingles it shares with any OTHER image's
    caption (a caption is by construction a prefix of its own source
    doc, so self-matches are excluded at the join).

    Scale: the caption shingle set is tiny relative to the corpus
    (64-char captions → ≤ a handful of shingles each) — broadcast it;
    the doc side streams through one equijoin + a partial-agg distinct
    count per doc. No per-row Python."""
    docs = load(spark, sf_dir, "documents")

    def shingles(df, id_col, text_expr):
        L = TX.analyzed_tokens(text_expr, CFG)
        base = df.select(F.col(id_col), L.alias("L")).filter(
            F.size("L") >= SHINGLE_N
        )
        grams = F.transform(
            F.sequence(F.lit(1), F.size("L") - (SHINGLE_N - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("L"), i),
                F.element_at(F.col("L"), i + 1),
                F.element_at(F.col("L"), i + 2),
            ),
        )
        return base.select(
            id_col, F.explode(F.array_distinct(grams)).alias("shingle")
        )

    caps = docs.filter(F.col("doc_id") < N_DOCS).select(
        F.col("doc_id").alias("image_id"),
        F.substring("text", 1, 64).alias("caption"),
    )
    cap_sh = shingles(caps, "image_id", F.col("caption")).distinct()
    doc_sh = shingles(docs, "doc_id", F.col("text")).distinct()
    hits = (
        doc_sh.join(F.broadcast(cap_sh), "shingle")
        .filter(F.col("image_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n"))
    )
    all_docs = doc_sh.select("doc_id").distinct()
    return all_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce(F.col("n"), F.lit(0)) > 0).cast("long").alias("contaminated"),
    )


@register(
    "image_dedup_clusters",
    f"""
WITH RECURSIVE
{PHASH_SQL},
bands AS (
  SELECT did, phash, b.band_id,
         (phash >> (b.band_id * 16)) & 65535 AS band_value
  FROM ph CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_id) b
),
ppairs AS (
  SELECT DISTINCT l.did AS a, r.did AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_value = r.band_value
  WHERE l.did < r.did AND bit_count(xor(l.phash, r.phash)) <= 3
),
{_CAPTIONS_SQL},
normed AS (SELECT image_id AS iid, {_NORM_SQL} AS cn FROM captions),
mins AS (SELECT cn, min(iid) AS m FROM normed GROUP BY cn),
cstars AS (
  SELECT m AS a, iid AS b FROM normed JOIN mins USING (cn) WHERE iid <> m
),
ep AS (SELECT a, b FROM ppairs UNION SELECT a, b FROM cstars),
edges AS (SELECT a AS src, b AS dst FROM ep UNION SELECT b, a FROM ep),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.doc_id
),
labels AS (SELECT doc_id, min(comp) AS cluster_id FROM reach GROUP BY doc_id)
SELECT CAST(l.doc_id AS VARCHAR) AS image_id,
       CAST(l.cluster_id AS VARCHAR) AS cluster_id,
       count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       CAST(l.doc_id = l.cluster_id AS BIGINT) AS is_canonical
FROM labels l
""",
)
def image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup image clusters: connected components over the union of
    pixel evidence (phash banded-LSH pairs, Hamming ≤ 3) and caption
    evidence (exact normalized-caption groups as star edges —
    image → its group's min id; a group of size g contributes g-1
    edges, CC-equivalent to the clique). cluster_id = min numeric
    image id in the component = the transitive "first wins" canonical.

    Scale: both edge sources are already candidate-bounded (LSH
    buckets / caption groups); the CC loop shuffles edges once per
    round and converges in diameter rounds — see
    pipeline_q.connected_components."""
    imgs = images_from_documents(spark, sf_dir)
    phash_pairs = IM.phash_near_dups(imgs, max_hamming=3).select(
        F.col("a_id").cast("long").alias("doc_a"),
        F.col("b_id").cast("long").alias("doc_b"),
    )
    caps = imgs.select(
        F.col("image_id").cast("long").alias("iid"),
        _norm_caption(F.col("caption")).alias("caption_norm"),
    )
    mins = caps.groupBy("caption_norm").agg(F.min("iid").alias("m"))
    cap_stars = (
        caps.join(mins, "caption_norm")
        .filter(F.col("iid") != F.col("m"))
        .select(F.col("m").alias("doc_a"), F.col("iid").alias("doc_b"))
    )
    edges = phash_pairs.unionByName(cap_stars).distinct()
    cc = connected_components(edges)
    return cc.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.col("cluster_id").cast("string").alias("cluster_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).cast("long").alias(
            "is_canonical"
        ),
    )


# ---------------------------------------------------------------------------
# LAION-style image+caption curation gate thresholds. Integer-exact on
# both engines: the aspect rule is a pure int compare, never a float
# ratio.
_MIN_SIDE = 24
# aspect rule: greatest/least > 3/2, written 2*greatest > 3*least so it
# stays in integers (ratio 2 is unreachable here: any such image is
# already below the min-side floor on this synthetic table)
_ASPECT_NUM = 3
_ASPECT_DEN = 2
_MIN_CAP_WORDS = 12


@register(
    "image_curation_filter",
    f"""
WITH m AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS image_id,
         {wh_case_sql("d.doc_id")},
         len(list_filter(regexp_split_to_array(substr(d.text, 1, 64), '\\s+'),
                         x -> x <> '')) AS n_cap_words,
         f.phash
  FROM documents d JOIN (VALUES {PHASH_VALUES_SQL}) f(did, phash) ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
),
g AS (
  SELECT m.*, count(*) OVER (PARTITION BY phash) AS phash_n FROM m
)
SELECT image_id,
       CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(n_cap_words AS BIGINT) AS n_cap_words,
       CASE
         WHEN least(w, h) < {_MIN_SIDE} THEN 'too_small'
         WHEN {_ASPECT_DEN} * greatest(w, h) > {_ASPECT_NUM} * least(w, h) THEN 'aspect'
         WHEN n_cap_words < {_MIN_CAP_WORDS} THEN 'caption_short'
         WHEN phash_n > 1 THEN 'phash_dup'
         ELSE 'ok'
       END AS reason,
       CAST(least(w, h) >= {_MIN_SIDE}
            AND {_ASPECT_DEN} * greatest(w, h) <= {_ASPECT_NUM} * least(w, h)
            AND n_cap_words >= {_MIN_CAP_WORDS}
            AND phash_n = 1 AS BIGINT) AS keep
FROM g
""",
)
def image_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style curation gate over the image+caption table — the
    image-axis twin of gopher_quality_filter: per image, a keep/drop
    verdict plus the FIRST failing gate in a fixed order (min-side
    floor, aspect-ratio band, caption word-count floor, exact-phash
    duplicate). Every rule is integer-exact (the 3:2 aspect band
    compares 2*greatest > 3*least, never a float ratio), so the
    verdict is engine-exact.

    Scale: one metadata-only pass over the image table (the binary
    payload column is never read), one window count on phash (64-bit
    key — partial-agg-friendly; at 100 TB replace the window with a
    groupBy-count + broadcast-join of the tiny dup-key set). The DuckDB
    oracle re-derives w/h/caption from documents (the synthetic table
    is a pure function of doc_id; queries/image_q.py) and reads phash
    from the pinned fixture."""
    imgs = images_from_documents(spark, sf_dir).select(
        "image_id", "w", "h", "caption", "phash"
    )
    n_words = F.size(F.filter(F.split("caption", r"\s+"), lambda x: x != ""))
    g = imgs.select(
        "image_id",
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        n_words.cast("long").alias("n_cap_words"),
        "phash",
    ).withColumn(
        "phash_n", F.count(F.lit(1)).over(Window.partitionBy("phash"))
    )
    small = F.least("w", "h") < _MIN_SIDE
    aspect = _ASPECT_DEN * F.greatest("w", "h") > _ASPECT_NUM * F.least("w", "h")
    cap_short = F.col("n_cap_words") < _MIN_CAP_WORDS
    dup = F.col("phash_n") > 1
    return g.select(
        "image_id",
        "w",
        "h",
        "n_cap_words",
        F.when(small, "too_small")
        .when(aspect, "aspect")
        .when(cap_short, "caption_short")
        .when(dup, "phash_dup")
        .otherwise("ok")
        .alias("reason"),
        (~small & ~aspect & ~cap_short & ~dup).cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Pixel-embedding near-dup: the image-axis twin of
# embedding_cosine_near_dups. The embedding is DERIVED FROM THE DECODED
# PIXELS (operators/images.grid_feature_vector — all-int64, so every
# dot product is engine-exact), not read from a column; the similarity
# stack on top is the same 8-plane LSH bucket + in-bucket cosine.
_IMG_PLANES = 8
_IMG_COS_THRESHOLD_MICRO = 990_000  # twins >= 0.9998, all others <= 0.968

_FCOLS = ", ".join(f"f{i}" for i in range(IM.GRID_DIMS))
_FCASE = " ".join(f"WHEN {i} THEN f{i}" for i in range(IM.GRID_DIMS))


def _img_plane_weights():
    """(P, D) int64 plane matrix, md5-derived ints in [-1000, 1000] —
    the integer sibling of dedup_q._md5_rational (same md5 → same
    value), exact under int64 dot products on both engines."""
    import hashlib

    import numpy as np

    W = np.zeros((_IMG_PLANES, IM.GRID_DIMS), dtype=np.int64)
    for p in range(_IMG_PLANES):
        for d in range(IM.GRID_DIMS):
            h = int(hashlib.md5(f"imgplane{p}/{d}".encode()).hexdigest()[:15], 16)
            W[p, d] = h % 2001 - 1000
    return W


@register(
    "image_embedding_near_dups",
    f"""
WITH feats AS (
  SELECT f.did, {_FCOLS}
  FROM (VALUES {FEATS_VALUES_SQL}) f(did, {_FCOLS})
  JOIN documents d ON d.doc_id = f.did
  WHERE d.doc_id < {N_DOCS}
),
fv AS (
  SELECT did, dim.d AS dim, CAST(CASE dim.d {_FCASE} END AS BIGINT) AS v
  FROM feats, (SELECT unnest(range({IM.GRID_DIMS})) AS d) dim
),
planes AS (
  SELECT p.p AS plane, d.d AS dim,
         ({_md5_64_sql("'imgplane' || p.p || '/' || d.d")} % 2001 - 1000) AS w
  FROM (SELECT unnest(range({_IMG_PLANES})) AS p) p,
       (SELECT unnest(range({IM.GRID_DIMS})) AS d) d
),
proj AS (
  SELECT fv.did, pl.plane, CAST(sum(fv.v * pl.w) AS BIGINT) AS dot_s
  FROM fv JOIN planes pl ON pl.dim = fv.dim
  GROUP BY fv.did, pl.plane
),
buckets AS (
  SELECT did,
         sum(CASE WHEN dot_s > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS bucket
  FROM proj GROUP BY did
),
norms AS (
  SELECT did, CAST(sum(v * v) AS BIGINT) AS nrm FROM fv GROUP BY did
),
pairs AS (
  SELECT a.did AS a_id, b.did AS b_id
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
  WHERE a.did < b.did
),
dots AS (
  SELECT p.a_id, p.b_id, CAST(sum(av.v * bv.v) AS BIGINT) AS dot_s
  FROM pairs p
  JOIN fv av ON av.did = p.a_id
  JOIN fv bv ON bv.did = p.b_id AND bv.dim = av.dim
  GROUP BY p.a_id, p.b_id
),
cos AS (
  SELECT d.a_id, d.b_id,
         CAST(round(d.dot_s / sqrt(CAST(na.nrm AS DOUBLE) * nb.nrm) * 1e6)
              AS BIGINT) AS cos_micro
  FROM dots d
  JOIN norms na ON na.did = d.a_id
  JOIN norms nb ON nb.did = d.b_id
)
SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id, cos_micro
FROM cos WHERE cos_micro >= {_IMG_COS_THRESHOLD_MICRO}
""",
)
def image_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-derived embedding near-dups: decode every payload, pool
    into the 16-dim integer grid-feature vector
    (operators/images.grid_feature_vector), LSH-bucket on 8 integer
    md5-derived hyperplanes, and score in-bucket all-pairs cosine via
    the exact block-pair grid (dedup_q._block_paired_pairs — output-
    identical distribution of the quadratic work). The decode +
    featurize stage is a map (payload bytes never shuffle); only
    (image_id, 16xint64, bucket) rows move.

    Engine-exactness: features, plane weights, plane dots, pair dots
    and norms are all int64 (no rounding anywhere before the final
    cosine); the single float op — dot / sqrt(double(na)*nb) * 1e6,
    round-half-away — is evaluated identically on both engines, and the
    twin/non-twin cosine gap (0.9998 vs 0.968 around the 0.99
    threshold) dwarfs any last-ulp concern. The DuckDB oracle reads the
    pinned per-doc feature fixture (pure function of doc_id,
    fixtures/image_feats.py, drift-guarded in
    tests/test_image_pipeline.py) and re-expresses bucketing + cosine
    in SQL."""
    import numpy as np
    import pandas as pd

    feats = IM.grid_features(images_from_documents(spark, sf_dir))
    W = _img_plane_weights()
    dots = [
        F.aggregate(
            F.zip_with(
                "feat",
                F.array(*[F.lit(int(w)) for w in W[p]]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for p in range(_IMG_PLANES)
    ]
    bucket = sum(
        ((d > 0).cast("long") * F.lit(1 << p)) for p, d in enumerate(dots)
    )
    bucketed = feats.select(
        F.col("image_id").cast("long").alias("did"),
        "feat",
        bucket.alias("bucket"),
    )

    from gocrawler_spark.queries.dedup_q import _block_paired_pairs

    def nrm_fn(X):
        return (X * X).sum(axis=1)  # exact int64

    def dot_fn(Xs, x):
        return (Xs * x).sum(axis=1)  # exact int64

    return _block_paired_pairs(
        bucketed,
        "did",
        "feat",
        nrm_fn,
        dot_fn,
        _IMG_COS_THRESHOLD_MICRO,
        "a_id",
        "b_id",
    )


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing: multi-resolution image training (SDXL /
# LAION practice) groups images into a fixed ladder of aspect-ratio
# buckets so each batch is resized to its bucket's geometry instead of
# center-cropping everything square — the bucket assignment and the
# letterbox-waste accounting are the data-pipeline side of that.
# Assignment: nearest ladder ratio by |round(w*1000/h) - bucket_milli|,
# ties to the SMALLER bucket value. Waste: the letterbox padding
# fraction 1000 - round(min(a,b)*1000/max(a,b)) per image (milli).
#
# Scale shape: metadata-only projection (payload bytes never move), a
# 7-row broadcast ladder join, one groupBy(bucket) with map-side
# combine — O(buckets) output.
_AR_BUCKETS_MILLI = [500, 667, 750, 1000, 1333, 1500, 2000]
_AR_VALUES_SQL = ", ".join(f"({b})" for b in _AR_BUCKETS_MILLI)


def _image_ar_sql() -> str:
    from gocrawler_spark.queries.image_q import N_DOCS, wh_case_sql

    return f"""
WITH dims AS (
  SELECT doc_id AS iid, {wh_case_sql("doc_id")}
  FROM documents WHERE doc_id < {N_DOCS}
),
ratio AS (
  SELECT iid, w, h,
         CAST(round(w * 1000.0 / h) AS BIGINT) AS ratio_milli
  FROM dims
),
assigned AS (
  SELECT iid, w, h, ratio_milli, bucket_milli FROM (
    SELECT r.*, b.bucket_milli,
           row_number() OVER (
             PARTITION BY r.iid
             ORDER BY abs(r.ratio_milli - b.bucket_milli) ASC,
                      b.bucket_milli ASC) AS rnk
    FROM ratio r, (VALUES {_AR_VALUES_SQL}) b(bucket_milli)
  ) WHERE rnk = 1
)
SELECT bucket_milli,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS sum_px,
       CAST(sum(1000 - CAST(round(
              least(ratio_milli, bucket_milli) * 1000.0
              / greatest(ratio_milli, bucket_milli)) AS BIGINT))
            AS BIGINT) AS sum_pad_milli
FROM assigned
GROUP BY bucket_milli
ORDER BY bucket_milli
"""


@register("image_ar_buckets", _image_ar_sql())
def image_ar_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucket histogram + letterbox-waste accounting over
    the input_hint payload table (Spark side reads the REAL image
    metadata via the decode path, oracle re-derives it closed-form)."""
    imgs = images_from_documents(spark, sf_dir).select(
        F.col("image_id").cast("long").alias("iid"), "w", "h"
    )
    ladder = spark.createDataFrame(
        [(b,) for b in _AR_BUCKETS_MILLI], "bucket_milli long"
    )
    ratio = imgs.withColumn(
        "ratio_milli",
        F.round(F.col("w") * F.lit(1000.0) / F.col("h")).cast("long"),
    )
    w = Window.partitionBy("iid").orderBy(
        F.abs(F.col("ratio_milli") - F.col("bucket_milli")).asc(),
        F.col("bucket_milli").asc(),
    )
    assigned = (
        ratio.crossJoin(F.broadcast(ladder))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )
    pad = F.lit(1000) - F.round(
        F.least("ratio_milli", "bucket_milli")
        * F.lit(1000.0)
        / F.greatest("ratio_milli", "bucket_milli")
    ).cast("long")
    return (
        assigned.groupBy("bucket_milli")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("w").cast("long") * F.col("h"))
            .cast("long")
            .alias("sum_px"),
            F.sum(pad).cast("long").alias("sum_pad_milli"),
        )
        .orderBy("bucket_milli")
    )
