r"""Deduplication + similarity-search queries (training-data pipeline
extensions; first-class per the build brief).

All hash-based sketches use md5-derived 64-bit integers
(`conv(substr(md5(x),1,15),16,10)` / `('0x'||substr(md5(x),1,15))::BIGINT`)
so Spark and DuckDB compute IDENTICAL hashes — 15 hex digits < 2^60
fits signed 64-bit on both sides. Floating-point similarity scores are
integerized through order-independent scaled-integer sums (see
queries/__init__.py).

Scale notes per query are in the docstrings; the common theme: shingle
explosion is a flatMap (no shuffle), sketches aggregate per doc
(one shuffle), LSH banding turns O(n²) pair comparison into a
bucket-equijoin that Spark shuffles on the band key.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, memo_result, register
from gocrawler_spark.queries.crawler_q import CFG, STOP_RX, TOKS_SQL
from gocrawler_spark.functions import text as TX

N_MINHASH = 16
N_BANDS = 4  # rows per band = 4
SHINGLE_N = 3
# Shingles appearing in more than this many documents are dropped before the
# shared-shingle self-join: boilerplate shingles ("all rights reserved ...")
# otherwise create a quadratic hot key at scale. Pairs whose overlap consists
# only of such boilerplate are exactly the pairs near-dup detection should
# ignore; genuinely similar pairs share plenty of sub-cap shingles.
JACCARD_DF_CAP = 100


def _md5_64_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _md5_64(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _md5_rational(key: str) -> float:
    """Deterministic rational in (-1, 1) from an md5 key — the shared
    weight generator for LSH planes / IVF centroids / PQ codebooks.
    n/1000 with |n| <= 1000 so float64 on both engines agrees exactly
    through the scaled-integer dot products."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def _md5_rational_sql(expr: str) -> str:
    """SQL twin of _md5_rational (same md5 → same rational)."""
    return f"({_md5_64_sql(expr)} % 2001 - 1000) / 1000.0"


# shared: per-doc analyzed-token SHINGLE list (n=3), en docs
_SHINGLES_CTE = f"""
toklists AS (
  SELECT doc_id,
         list_filter({TOKS_SQL}, t -> NOT regexp_matches(t, '{STOP_RX}')) AS L
  FROM documents WHERE lang = 'en'
),
shingles AS (
  SELECT doc_id, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS shingle
  FROM (SELECT doc_id, L, unnest(range(1, len(L) - 1)) AS i
        FROM toklists WHERE len(L) >= {SHINGLE_N})
),
doc_shingles AS (
  SELECT DISTINCT doc_id, shingle FROM shingles
)
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    L = TX.analyzed_tokens(F.col("text"), CFG)
    docs = docs.select("doc_id", L.alias("L")).filter(F.size("L") >= SHINGLE_N)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("L") - (SHINGLE_N - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("L"), i),
            F.element_at(F.col("L"), i + 1),
            F.element_at(F.col("L"), i + 2),
        ),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    f"""
WITH norm AS (
  SELECT doc_id,
         md5(array_to_string(
             list_filter({TOKS_SQL}, t -> NOT regexp_matches(t, '{STOP_RX}')),
             ' ')) AS norm_key
  FROM documents
)
SELECT norm_key, min(doc_id) AS first_doc, count(*) AS n_docs
FROM norm GROUP BY norm_key
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the md5 of the normalized (analyzed) text — the
    hash-groupBy pattern: map-side combine, one shuffle on the key;
    at 100 TB the key is 128-bit so the groupBy state is tiny."""
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.array_join(TX.analyzed_tokens(F.col("text"), CFG), " "))
    return (
        docs.select("doc_id", key.alias("norm_key"))
        .groupBy("norm_key")
        .agg(F.min("doc_id").alias("first_doc"), F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_CTE},
kept AS (
  SELECT doc_id, shingle FROM doc_shingles
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_DF_CAP}
),
sizes AS (
  SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared,
       CAST(round(CAST(shared AS DOUBLE)
            / (sa.n + sb.n - shared) * 1e6) AS BIGINT) AS jaccard_micro
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.03
""",
)
@memo_result
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs via the shared-shingle equijoin.
    Scale: the join shuffles on the shingle; skew control is the
    document-frequency cap — shingles seen in more than JACCARD_DF_CAP
    docs are dropped before the self-join (a per-shingle count, one
    partial-agg shuffle), so no shingle key can fan out more than
    cap^2 pairs; AQE skew-split handles the remainder. Jaccard is
    computed over the capped shingle sets on both engine and oracle."""
    ds = _doc_shingles(spark, sf_dir)
    # df cap as a window over the shingle partition: ONE shuffle on the
    # shingle, whose partitioning the self-join below then reuses (no
    # extra exchange vs the uncapped plan).
    kept = (
        ds.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= JACCARD_DF_CAP)
        .drop("df")
    )
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    return j.filter(jac >= 0.03).select(
        "doc_a", "doc_b", "shared",
        F.round(jac * 1e6).cast("bigint").alias("jaccard_micro"),
    )


# ---------------------------------------------------------------------------
@register(
    "minhash_bands",
    f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, i.h AS perm,
         min({_md5_64_sql("i.h || '#' || shingle")}) AS minhash
  FROM doc_shingles, (SELECT unnest(range({N_MINHASH})) AS h) i
  GROUP BY doc_id, i.h
),
bands AS (
  SELECT doc_id, perm // {N_MINHASH // N_BANDS} AS band,
         string_agg(minhash, ',' ORDER BY perm) AS sig
  FROM hashed GROUP BY doc_id, band
)
SELECT doc_id, band, md5(sig) AS bucket FROM bands
""",
)
def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banding (shingle → minhash → band → bucket): the
    classic near-dup path. Per doc: 16 permutations (md5-keyed), 4
    bands of 4 → bucket = md5 of the band signature. Candidate pairs =
    equijoin on (band, bucket) downstream. Scale: minhash is a
    map-side agg per (doc, perm); the bucket join replaces the O(n²)
    pair space."""
    return _bands_from(spark, _doc_shingles(spark, sf_dir))


def _bands_from(spark: SparkSession, ds: DataFrame) -> DataFrame:
    perms = spark.range(N_MINHASH).select(F.col("id").cast("int").alias("perm"))
    hashed = (
        ds.crossJoin(F.broadcast(perms))
        .select(
            "doc_id",
            "perm",
            _md5_64(
                F.concat(F.col("perm").cast("string"), F.lit("#"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )
    rows_per_band = N_MINHASH // N_BANDS
    bands = (
        hashed.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("perm", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("sig")
        )
    )
    return bands.select(
        "doc_id", F.col("band").cast("long").alias("band"), F.md5("sig").alias("bucket")
    )


# ---------------------------------------------------------------------------
# shared: per-doc 32-bit SimHash (used by simhash32 and simhash_near_dups)
_SIMHASH_CTE = f"""{_SHINGLES_CTE},
tok AS (
  SELECT DISTINCT doc_id, shingle, {_md5_64_sql("shingle")} AS h
  FROM doc_shingles
),
bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tok, (SELECT unnest(range(32)) AS i) b
  GROUP BY doc_id, b.i
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bits GROUP BY doc_id
)
"""


@register(
    "simhash32",
    f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash FROM sh
""",
)
def simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) over shingle hashes: per-bit majority vote of
    feature hashes. Near-dup = small Hamming distance downstream.
    Integer-only → bit-exact across engines. Scale: two groupBys on
    (doc, bit) then doc — both partial-agg friendly."""
    ds = _doc_shingles(spark, sf_dir)
    bits = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    tok = ds.select("doc_id", _md5_64(F.col("shingle")).alias("h"))
    per_bit = (
        tok.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "bit",
            F.when(F.call_function("shiftright", F.col("h"), F.col("bit")).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
            .alias("s"),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("s").alias("v"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), F.col("bit")))
            .otherwise(F.lit(0))
        ).alias("simhash")
    )


SIMHASH_BANDS = 4  # 4 bands x 8 bits over the 32-bit hash
SIMHASH_MAX_HAMMING = 3  # pigeonhole: <=3 flipped bits leave >=1 band intact


@register(
    "simhash_near_dups",
    f"""
WITH {_SIMHASH_CTE},
bands AS (
  SELECT doc_id, simhash, b.i AS band, (simhash >> (b.i * 8)) & 255 AS bval
  FROM sh, (SELECT unnest(range({SIMHASH_BANDS})) AS i) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS ha, b.simhash AS hb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
""",
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via banded LSH: split the 32-bit
    hash into 4x8-bit bands, bucket-equijoin on (band, value), then
    verify Hamming distance <= 3 with bit_count(xor). The pigeonhole
    principle makes recall exact: any pair within 3 flipped bits has
    at least one of its 4 bands unchanged, so banding loses nothing
    while reducing the O(n^2) pair space to per-bucket collisions.
    Scale: the join shuffles on (band, bval) — 1024 coarse keys at
    32 bits; at 100 TB widen the hash to 64 bits / 8 bands (same
    plan, finer buckets) so bucket sizes stay bounded."""
    sh = simhash32(spark, sf_dir)
    bands = spark.range(SIMHASH_BANDS).select(F.col("id").cast("int").alias("band"))
    banded = sh.crossJoin(F.broadcast(bands)).select(
        "doc_id",
        "simhash",
        "band",
        F.call_function("shiftright", F.col("simhash"), F.col("band") * 8)
        .bitwiseAND(255)
        .alias("bval"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("ha"),
        "band",
        "bval",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("hb"),
        "band",
        "bval",
    )
    cand = (
        a.join(b, ["band", "bval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
def _round_half_away(v):
    """Spark F.round / DuckDB round() semantics (half away from zero);
    numpy's rint is banker's rounding, which would diverge on ties."""
    import numpy as np

    return np.sign(v) * np.floor(np.abs(v) + 0.5)


_DOT_SCALED_SQL = """
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(CAST(round(qx.x * cx.x * 1e12) AS BIGINT)) AS dot_s
  FROM qv q
  JOIN cv c ON c.vec_id <> q.vec_id,
  LATERAL (SELECT unnest(q.embedding) AS x,
                  generate_subscripts(q.embedding, 1) AS i) qx,
  LATERAL (SELECT unnest(c.embedding) AS x,
                  generate_subscripts(c.embedding, 1) AS i) cx
  WHERE qx.i = cx.i
  GROUP BY q.vec_id, c.vec_id
"""


@register(
    "embedding_knn",
    f"""
WITH qv AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10
),
cv AS (
  SELECT vec_id, embedding FROM embeddings
),
norms AS (
  SELECT vec_id,
         sum(CAST(round(x.x * x.x * 1e12) AS BIGINT)) AS nrm_s
  FROM cv, LATERAL (SELECT unnest(embedding) AS x) x
  GROUP BY vec_id
),
dots AS ({_DOT_SCALED_SQL}),
cos AS (
  SELECT query_id, neighbor_id,
         CAST(round(dot_s / sqrt(CAST(nq.nrm_s AS DOUBLE) * nc.nrm_s) * 1e6)
              AS BIGINT) AS cos_micro
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_micro DESC, neighbor_id ASC) AS rnk
  FROM cos
)
SELECT query_id, neighbor_id, cos_micro, rnk FROM ranked WHERE rnk <= 5
""",
)
@memo_result
def embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline over array<float>
    embeddings. float*float products are EXACT in double (24+24 bits),
    pre-rounded to 1e-12-scaled BIGINTs and summed order-independently
    → deterministic across engines; ranking ties break on neighbor_id.

    Physical plan: the 10-query matrix is numpy-broadcast into an
    Arrow-batched mapInPandas over the corpus — each batch emits only
    its per-query top-5 partials (50 rows), and a final window picks
    the global top-5. No crossJoin, no shuffle of scored pairs, and
    the scoring is one numpy matmul-shaped pass instead of per-row
    Catalyst lambda trees (previous version: 27 s at sf0.001; this:
    sub-second). Scale path: the same scorer runs inside each
    IVF/LSH bucket (see ann_lsh_buckets)."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrows = emb.filter(F.col("vec_id") < 10).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = _round_half_away(Q * Q * 1e12).astype(np.int64).sum(axis=1)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cid = pdf["vec_id"].to_numpy(dtype=np.int64)
            cn = _round_half_away(C * C * 1e12).astype(np.int64).sum(axis=1)
            out = []
            for j in range(len(q_ids)):
                dot = _round_half_away(C * Q[j] * 1e12).astype(np.int64).sum(axis=1)
                cos = _round_half_away(
                    dot / np.sqrt(qn[j].astype(np.float64) * cn) * 1e6
                ).astype(np.int64)
                mask = cid != q_ids[j]
                d = pd.DataFrame(
                    {
                        "query_id": q_ids[j],
                        "neighbor_id": cid[mask],
                        "cos_micro": cos[mask],
                    }
                ).sort_values(
                    ["cos_micro", "neighbor_id"], ascending=[False, True]
                ).head(5)
                out.append(d)
            yield pd.concat(out, ignore_index=True)

    partials = emb.mapInPandas(
        score, "query_id long, neighbor_id long, cos_micro long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_micro", "rnk")
    )


# ---------------------------------------------------------------------------
@register(
    "ann_lsh_buckets",
    f"""
WITH planes AS (
  SELECT p.p AS plane, d.d AS dim,
         {_md5_rational_sql("'plane' || p.p || '/' || d.d")} AS w
  FROM (SELECT unnest(range(8)) AS p) p, (SELECT unnest(range(64)) AS d) d
),
proj AS (
  SELECT e.vec_id, pl.plane,
         sum(CAST(round(x.x * pl.w * 1e9) AS BIGINT)) AS dot_s
  FROM embeddings e,
       LATERAL (SELECT unnest(e.embedding) AS x,
                       generate_subscripts(e.embedding, 1) AS i) x
  JOIN planes pl ON pl.dim = x.i - 1
  GROUP BY e.vec_id, pl.plane
)
SELECT vec_id,
       CAST(sum(CASE WHEN dot_s > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
FROM proj GROUP BY vec_id
""",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (8 planes → 256 buckets): the
    scale path for ANN — candidate generation becomes an equijoin on
    bucket instead of a cross join. Plane weights are md5-derived
    rationals so both engines compute identical signs.

    Physical plan: the 8x64 plane matrix is built on the driver
    (md5 arithmetic identical to the SQL) and numpy-applied in one
    mapInPandas pass — no posexplode (64x row blowup), no join, no
    per-(vec, plane) shuffle. Embarrassingly parallel per partition."""

    import numpy as np
    import pandas as pd

    W = np.empty((8, 64), dtype=np.float64)
    for p in range(8):
        for d in range(64):
            W[p, d] = _md5_rational(f"plane{p}/{d}")

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            bucket = np.zeros(len(X), dtype=np.int64)
            for p in range(8):
                dot_s = _round_half_away(X * W[p] * 1e9).astype(np.int64).sum(axis=1)
                bucket |= (dot_s > 0).astype(np.int64) << p
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64), "bucket": bucket}
            )

    return emb.mapInPandas(bucketize, "vec_id long, bucket long")


# ---------------------------------------------------------------------------
@register(
    "minhash_lsh_pairs",
    f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, i.h AS perm,
         min({_md5_64_sql("i.h || '#' || shingle")}) AS minhash
  FROM doc_shingles, (SELECT unnest(range({N_MINHASH})) AS h) i
  GROUP BY doc_id, i.h
),
bands AS (
  SELECT doc_id, perm // {N_MINHASH // N_BANDS} AS band,
         md5(string_agg(minhash, ',' ORDER BY perm)) AS bucket
  FROM hashed GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
sizes AS (
  SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM doc_shingles a JOIN doc_shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(round(CAST(COALESCE(s.shared, 0) AS DOUBLE)
            / (sa.n + sb.n - COALESCE(s.shared, 0)) * 1e6) AS BIGINT)
         AS jaccard_micro
FROM cand c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
LEFT JOIN shared s ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
""",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash-LSH near-dup chain: shingle → minhash → band →
    BUCKET-JOIN → candidate pairs → exact-Jaccard verification.

    Completes minhash_bands: candidate generation is the (band, bucket)
    self-equijoin (shuffles only 4 band rows per doc — never the O(n²)
    pair space), and each candidate pair is then verified with the
    exact shingle Jaccard (computed only for candidates; the verify
    join is candidate-sized). Scale: band buckets bound the join fanout
    (docs per bucket), and the verify stage is proportional to true
    near-dups + LSH false positives, not to corpus size."""
    # The shingle relation feeds FOUR consumers (minhash banding, doc
    # sizes, and both sides of the verify join) — materialize it once
    # (blocks are freed by the ContextCleaner when the RDD is GC'd).
    # At 100 TB you'd write it to a temp table instead of executor
    # memory; the dataflow is unchanged.
    ds = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    bands = _bands_from(spark, ds)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    # exact-Jaccard verify restricted to LSH candidates: expand each
    # candidate pair by doc_a's shingles, then probe doc_b's shingles —
    # cost is O(candidates x shingles/doc), never the corpus-quadratic
    # all-pairs shingle self-join (measured 20x faster at sf0.1)
    shared = (
        cand.join(ds.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            ds.select(
                F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle")
            ),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(shared, ["doc_a", "doc_b"], "left")
        .withColumn("sh", F.coalesce(F.col("shared"), F.lit(0)))
    )
    return j.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("sh").cast("double")
            / (F.col("na") + F.col("nb") - F.col("sh"))
            * 1e6
        )
        .cast("bigint")
        .alias("jaccard_micro"),
    )


# ---------------------------------------------------------------------------
_COS_THRESHOLD_MICRO = 200_000  # cos >= 0.2


_PAIR_BLOCKS = 2  # block-pair grid width (B): per-bucket O(g²) scoring
# splits EXACTLY over B(B+1)/2 tasks; rows replicate B× — the scale
# knob for in-bucket all-pairs work


def _block_paired_pairs(
    joined: DataFrame,
    id_col: str,
    emb_col: str,
    nrm_fn,
    dot_fn,
    threshold: int,
    out_a: str,
    out_b: str,
    blocks: int = _PAIR_BLOCKS,
) -> DataFrame:
    """EXACT all-pairs-within-bucket cosine scoring, distributed.

    The naive shape (groupBy(bucket).applyInPandas over the whole
    bucket) puts a bucket's entire O(g²) pair work — and its full
    embedding set — in ONE task, which grows linearly in memory and
    quadratically in work with the corpus (the LSH key space is a
    fixed constant shared with the oracle). This driver splits it
    without changing a single output value:

    - each vector lands in block ``xxhash64(id) % B`` of its bucket;
    - a vector in block i is shipped to every block-pair (min(i,j),
      max(i,j)) for j in 0..B-1 — B copies per vector;
    - task (bucket, bi, bj) scores exactly the pairs with one side in
      bi and the other in bj (all pairs within the block when
      bi == bj), so the union over the B(B+1)/2 tasks is every
      in-bucket pair exactly once;
    - the cosine kernel is symmetric (per-element products, symmetric
      norm product), so a pair's value is bit-identical regardless of
      which side is "a" — verified by the unchanged DuckDB oracles.

    Per-task work drops to (g/B)²; B is a constant here because the
    test buckets are tiny, and at 100 TB it is the knob that holds
    per-task memory flat while total work stays the same O(g²) the
    algorithm owes."""
    import numpy as np
    import pandas as pd

    B = blocks
    rows = (
        joined.select(
            "bucket",
            F.col(id_col).alias("_id"),
            F.col(emb_col).alias("_emb"),
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(B)
            )
            .cast("int")
            .alias("_blk"),
        )
        .withColumn("_other", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .select(
            "bucket",
            "_id",
            "_emb",
            "_blk",
            F.least("_blk", "_other").alias("_bi"),
            F.greatest("_blk", "_other").alias("_bj"),
        )
    )

    def _prep(pdf):
        pdf = pdf.sort_values("_id")
        X = np.array(pdf["_emb"].tolist())
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        return ids, X, nrm_fn(X)

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[1]), int(key[2])
        empty = pd.DataFrame({out_a: [], out_b: [], "cos_micro": []}).astype(
            {out_a: "int64", out_b: "int64", "cos_micro": "int64"}
        )
        oa, ob, oc = [], [], []
        if bi == bj:
            if len(pdf) < 2:
                return empty
            ids, X, nrm = _prep(pdf)
            for i in range(len(ids) - 1):
                dot = dot_fn(X[i + 1 :], X[i])
                cos = _round_half_away(
                    dot / np.sqrt(nrm[i].astype(np.float64) * nrm[i + 1 :]) * 1e6
                ).astype(np.int64)
                keep = cos >= threshold
                oa.append(np.full(int(keep.sum()), ids[i]))
                ob.append(ids[i + 1 :][keep])
                oc.append(cos[keep])
        else:
            a_rows = pdf[pdf["_blk"] == bi]
            b_rows = pdf[pdf["_blk"] == bj]
            if len(a_rows) == 0 or len(b_rows) == 0:
                return empty
            ids_a, X_a, nrm_a = _prep(a_rows)
            ids_b, X_b, nrm_b = _prep(b_rows)
            for i in range(len(ids_a)):
                dot = dot_fn(X_b, X_a[i])
                cos = _round_half_away(
                    dot / np.sqrt(nrm_a[i].astype(np.float64) * nrm_b) * 1e6
                ).astype(np.int64)
                keep = cos >= threshold
                pb = ids_b[keep]
                pa = np.full(len(pb), ids_a[i])
                oa.append(np.minimum(pa, pb))
                ob.append(np.maximum(pa, pb))
                oc.append(cos[keep])
        if not oa:
            return empty
        return pd.DataFrame(
            {
                out_a: np.concatenate(oa),
                out_b: np.concatenate(ob),
                "cos_micro": np.concatenate(oc),
            }
        )

    return rows.groupBy("bucket", "_bi", "_bj").applyInPandas(
        score, f"{out_a} long, {out_b} long, cos_micro long"
    )



@register(
    "embedding_cosine_near_dups",
    f"""
WITH planes AS (
  SELECT p.p AS plane, d.d AS dim,
         {_md5_rational_sql("'plane' || p.p || '/' || d.d")} AS w
  FROM (SELECT unnest(range(8)) AS p) p, (SELECT unnest(range(64)) AS d) d
),
proj AS (
  SELECT e.vec_id, pl.plane,
         sum(CAST(round(x.x * pl.w * 1e9) AS BIGINT)) AS dot_s
  FROM embeddings e,
       LATERAL (SELECT unnest(e.embedding) AS x,
                       generate_subscripts(e.embedding, 1) AS i) x
  JOIN planes pl ON pl.dim = x.i - 1
  GROUP BY e.vec_id, pl.plane
),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN dot_s > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS bucket
  FROM proj GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
norms AS (
  SELECT vec_id, sum(CAST(round(x.x * x.x * 1e12) AS BIGINT)) AS nrm_s
  FROM embeddings, LATERAL (SELECT unnest(embedding) AS x) x
  GROUP BY vec_id
),
dots AS (
  SELECT p.vec_a, p.vec_b,
         sum(CAST(round(ax.x * bx.x * 1e12) AS BIGINT)) AS dot_s
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.vec_a
  JOIN embeddings eb ON eb.vec_id = p.vec_b,
  LATERAL (SELECT unnest(ea.embedding) AS x,
                  generate_subscripts(ea.embedding, 1) AS i) ax,
  LATERAL (SELECT unnest(eb.embedding) AS x,
                  generate_subscripts(eb.embedding, 1) AS i) bx
  WHERE ax.i = bx.i
  GROUP BY p.vec_a, p.vec_b
),
cos AS (
  SELECT d.vec_a, d.vec_b,
         CAST(round(d.dot_s / sqrt(CAST(na.nrm_s AS DOUBLE) * nb.nrm_s) * 1e6)
              AS BIGINT) AS cos_micro
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_a
  JOIN norms nb ON nb.vec_id = d.vec_b
)
SELECT vec_a, vec_b, cos_micro FROM cos
WHERE cos_micro >= {_COS_THRESHOLD_MICRO}
""",
)
@memo_result
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed: candidate pairs
    come from the 8-plane random-hyperplane bucket equijoin (same
    bucketing as ann_lsh_buckets), scored by the EXACT block-pair grid
    (_block_paired_pairs): a bucket's all-pairs work is split over
    B(B+1)/2 tasks with identical output, so per-task memory and work
    stay flat as buckets grow with the corpus — the fixed 256-bucket
    key space (oracle-shared planes) is no longer a single-task
    quadratic. No pair shuffle, no crossJoin; rows replicate B× into
    their block-pairs. The scaled-integer rounding matches DuckDB
    bit-for-bit (see _round_half_away)."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    buckets = ann_lsh_buckets(spark, sf_dir)
    joined = emb.join(buckets, "vec_id")

    def nrm_fn(X):
        return _round_half_away(X * X * 1e12).astype(np.int64).sum(axis=1)

    def dot_fn(Xs, x):
        return _round_half_away(Xs * x * 1e12).astype(np.int64).sum(axis=1)

    return _block_paired_pairs(
        joined,
        "vec_id",
        "embedding",
        nrm_fn,
        dot_fn,
        _COS_THRESHOLD_MICRO,
        "vec_a",
        "vec_b",
    )


# ---------------------------------------------------------------------------
_IVF_K = 16  # coarse cells
_IVF_NPROBE = 4


def _ivf_centroids():
    """K x 64 deterministic centroid matrix, md5-derived rationals —
    identical arithmetic in the SQL oracle."""

    import numpy as np

    C = np.empty((_IVF_K, 64), dtype=np.float64)
    for c in range(_IVF_K):
        for d in range(64):
            C[c, d] = _md5_rational(f"cent{c}/{d}")
    return C


_IVF_CENTS_SQL = f"""
cents AS (
  SELECT c.c AS cell, d.d AS dim,
         {_md5_rational_sql("'cent' || c.c || '/' || d.d")} AS w
  FROM (SELECT unnest(range({_IVF_K})) AS c) c,
       (SELECT unnest(range(64)) AS d) d
),
cellscore AS (
  SELECT e.vec_id, ct.cell,
         sum(CAST(round(x.x * ct.w * 1e9) AS BIGINT)) AS dot_s
  FROM embeddings e,
       LATERAL (SELECT unnest(e.embedding) AS x,
                       generate_subscripts(e.embedding, 1) AS i) x
  JOIN cents ct ON ct.dim = x.i - 1
  GROUP BY e.vec_id, ct.cell
)
"""


@register(
    "ann_ivf_topk",
    f"""
WITH {_IVF_CENTS_SQL},
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot_s DESC, cell ASC) AS r
    FROM cellscore
  ) WHERE r = 1
),
qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot_s DESC, cell ASC) AS r
    FROM cellscore WHERE vec_id < 10
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT q.query_id, a.vec_id AS neighbor_id
  FROM qprobe q JOIN assign a ON a.cell = q.cell
  WHERE a.vec_id <> q.query_id
),
norms AS (
  SELECT vec_id, sum(CAST(round(x.x * x.x * 1e12) AS BIGINT)) AS nrm_s
  FROM embeddings, LATERAL (SELECT unnest(embedding) AS x) x
  GROUP BY vec_id
),
dots AS (
  SELECT p.query_id, p.neighbor_id,
         sum(CAST(round(ax.x * bx.x * 1e12) AS BIGINT)) AS dot_s
  FROM cand p
  JOIN embeddings ea ON ea.vec_id = p.query_id
  JOIN embeddings eb ON eb.vec_id = p.neighbor_id,
  LATERAL (SELECT unnest(ea.embedding) AS x,
                  generate_subscripts(ea.embedding, 1) AS i) ax,
  LATERAL (SELECT unnest(eb.embedding) AS x,
                  generate_subscripts(eb.embedding, 1) AS i) bx
  WHERE ax.i = bx.i
  GROUP BY p.query_id, p.neighbor_id
),
cos AS (
  SELECT d.query_id, d.neighbor_id,
         CAST(round(d.dot_s / sqrt(CAST(na.nrm_s AS DOUBLE) * nb.nrm_s) * 1e6)
              AS BIGINT) AS cos_micro
  FROM dots d
  JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_micro DESC, neighbor_id ASC) AS rnk
  FROM cos
)
SELECT query_id, neighbor_id, cos_micro, rnk FROM ranked WHERE rnk <= 5
""",
)
@memo_result
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: the coarse-quantizer scale path. Corpus vectors
    are assigned to their nearest of K=16 md5-derived centroids
    (inverted lists); each query probes its nprobe=4 best cells and
    runs the exact scorer only inside those cells.

    Physical plan: centroid assignment is one numpy matmul-shaped
    mapInPandas pass (no per-(vec,centroid) shuffle); the probe is a
    broadcast of the 10-query cell lists + per-cell candidate semi-join;
    exact scoring reuses the in-batch partial-top-k shape of
    embedding_knn. At 1e10 vectors the inverted lists are the bucketed
    table and only probed cells are scanned (partition pruning)."""
    import numpy as np
    import pandas as pd

    C = _ivf_centroids()
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def cell_scores(X):
        # (n, K) scaled-int dot scores, identical rounding to SQL
        return np.stack(
            [
                _round_half_away(X * C[c] * 1e9).astype(np.int64).sum(axis=1)
                for c in range(_IVF_K)
            ],
            axis=1,
        )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            s = cell_scores(X)
            # np.argmax natively ties to the lowest index, matching the
            # oracle's row_number(ORDER BY dot_s DESC, cell ASC) pick.
            best = np.argmax(s, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64), "cell": best}
            )

    assigned = emb.mapInPandas(assign, "vec_id long, cell int")

    # driver-side probe lists for the 10 queries (tiny)
    qrows = emb.filter(F.col("vec_id") < 10).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qs = cell_scores(Q)
    order = np.lexsort((np.arange(_IVF_K)[None, :].repeat(len(q_ids), 0), -qs))
    probe_rows = [
        (int(q_ids[i]), int(order[i, j]))
        for i in range(len(q_ids))
        for j in range(_IVF_NPROBE)
    ]
    qprobe = spark.createDataFrame(probe_rows, "query_id long, cell int")

    cand_ids = (
        assigned.join(F.broadcast(qprobe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    cand = cand_ids.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )

    qn = _round_half_away(Q * Q * 1e12).astype(np.int64).sum(axis=1)
    qmap = {int(q_ids[j]): j for j in range(len(q_ids))}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for qid, grp in pdf.groupby("query_id"):
                j = qmap[int(qid)]
                Cm = np.array(grp["embedding"].tolist(), dtype=np.float64)
                cn = _round_half_away(Cm * Cm * 1e12).astype(np.int64).sum(axis=1)
                dot = _round_half_away(Cm * Q[j] * 1e12).astype(np.int64).sum(axis=1)
                cos = _round_half_away(
                    dot / np.sqrt(qn[j].astype(np.float64) * cn) * 1e6
                ).astype(np.int64)
                d = pd.DataFrame(
                    {
                        "query_id": int(qid),
                        "neighbor_id": grp["neighbor_id"].to_numpy(dtype=np.int64),
                        "cos_micro": cos,
                    }
                ).sort_values(
                    ["cos_micro", "neighbor_id"], ascending=[False, True]
                ).head(5)
                out.append(d)
            yield pd.concat(out, ignore_index=True)

    partials = cand.mapInPandas(score, "query_id long, neighbor_id long, cos_micro long")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_micro", "rnk")
    )


# ---------------------------------------------------------------------------
# ANN index-quality eval: recall@5 of the IVF scale path against the
# brute-force ground truth. A 100 TB similarity-search deployment ships
# this eval next to the index (it is how nprobe/K are tuned); both
# sides already exist as oracle-checked queries, so the oracle here is
# their SQL composed verbatim (DuckDB allows a full WITH-query as a
# CTE body).
from gocrawler_spark.queries import ORACLES as _ORACLES
from gocrawler_spark.queries import QUERIES

_K_EVAL = 5


@register(
    "ann_recall_at_k",
    f"""
WITH ext AS ({_ORACLES["embedding_knn"]}),
ivf AS ({_ORACLES["ann_ivf_topk"]}),
hits AS (
  SELECT e.query_id, count(i.neighbor_id) AS n_hits
  FROM ext e LEFT JOIN ivf i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
  GROUP BY e.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits * {1000000 // _K_EVAL} AS BIGINT) AS recall_ppm
FROM hits
""",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of ann_ivf_topk vs the embedding_knn exact ground
    truth, per query vector (recall_ppm = hits/5 in parts-per-million,
    integer-exact).

    Scale: both inputs are top-k-bounded (10 queries x 5 rows), so the
    eval join is trivially broadcast; at 1e10 vectors the ground truth
    comes from the same exact scorer run over a sampled query set —
    the eval cost is O(sample), never O(corpus)."""
    ext = QUERIES["embedding_knn"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ivf = (
        QUERIES["ann_ivf_topk"](spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    j = ext.join(ivf, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0)))
        .cast("long")
        .alias("n_hits"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * (1000000 // _K_EVAL)
        )
        .cast("long")
        .alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ADC search — the memory-compression ANN
# path: 64-dim float vectors become M=8 sub-codes of 4 bits (K=16
# centroids per subspace) = 4 bytes/vector, a 64x compression, and
# queries score candidates via per-subspace lookup tables (asymmetric
# distance computation) without touching the original vectors. At 1e10
# vectors this is what makes the index fit in executor memory.
# Codebooks here are the md5-derived deterministic stand-in the IVF
# query established (training them is a separate offline k-means stage;
# the engine path under test is encode + LUT + ADC), so the DuckDB
# oracle recomputes EVERYTHING from scratch in SQL — no pinned results.
_PQ_M = 8  # subspaces (8 dims each over the 64-dim embeddings)
_PQ_K = 16  # centroids per subspace


def _pq_codebooks():
    """(M, K, 8) deterministic codebook tensor, md5-derived rationals —
    identical arithmetic in the SQL oracle."""

    import numpy as np

    W = np.empty((_PQ_M, _PQ_K, 8), dtype=np.float64)
    for m in range(_PQ_M):
        for k in range(_PQ_K):
            for d in range(8):
                W[m, k, d] = _md5_rational(f"pq{m}/{k}/{d}")
    return W


_PQ_CENTS_SQL = f"""
pqc AS (
  SELECT m.m AS m, k.k AS k, d.d AS d,
         {_md5_rational_sql("'pq' || m.m || '/' || k.k || '/' || d.d")} AS w
  FROM (SELECT unnest(range({_PQ_M})) AS m) m,
       (SELECT unnest(range({_PQ_K})) AS k) k,
       (SELECT unnest(range(8)) AS d) d
),
xs AS (
  SELECT e.vec_id, (x.i - 1) // 8 AS m, (x.i - 1) % 8 AS d, x.x
  FROM embeddings e,
       LATERAL (SELECT unnest(e.embedding) AS x,
                       generate_subscripts(e.embedding, 1) AS i) x
),
dist AS (
  SELECT xs.vec_id, xs.m, pqc.k,
         sum(CAST(round((xs.x - pqc.w) * (xs.x - pqc.w) * 1e9) AS BIGINT))
           AS dist_s
  FROM xs JOIN pqc ON pqc.m = xs.m AND pqc.d = xs.d
  GROUP BY xs.vec_id, xs.m, pqc.k
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist_s ASC, k ASC) AS r
    FROM dist
  ) WHERE r = 1
),
lut AS (
  SELECT xs.vec_id AS query_id, xs.m, pqc.k,
         sum(CAST(round(xs.x * pqc.w * 1e12) AS BIGINT)) AS dot_s
  FROM xs JOIN pqc ON pqc.m = xs.m AND pqc.d = xs.d
  WHERE xs.vec_id < 10
  GROUP BY xs.vec_id, xs.m, pqc.k
)
"""


@register(
    "ann_pq_adc_topk",
    f"""
WITH {_PQ_CENTS_SQL},
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.dot_s) AS adc_s
  FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.k
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, neighbor_id, CAST(adc_s AS BIGINT) AS adc_s,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT query_id, neighbor_id, adc_s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_s DESC, neighbor_id ASC) AS rnk
  FROM adc
) WHERE rnk <= 5
""",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-5 per query vector: encode the corpus to (M=8, K=16)
    sub-codes (nearest centroid per subspace by scaled-int squared
    distance, ties to the lowest code), build per-query LUTs of
    scaled-int subspace dots, and rank candidates by the summed LUT
    entries — the vectors themselves are never touched at query time.

    Physical plan: ONE numpy mapInPandas pass over the corpus does
    encode + ADC together (the 10-query LUT tensor is driver-built and
    closure-broadcast, 10x8x16 BIGINTs) and emits only per-batch
    per-query top-5 partials, exactly the embedding_knn shape — no
    shuffle of scored pairs, no join. At 1e10 vectors the same pass
    reads the 4-byte codes table instead of raw vectors (64x less IO),
    and the LUT build stays O(queries)."""
    import numpy as np
    import pandas as pd

    W = _pq_codebooks()  # (M, K, 8)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    qrows = emb.filter(F.col("vec_id") < 10).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    nq = len(q_ids)
    # LUT[j, m, k] = scaled-int dot of query j's subvector m with
    # centroid (m, k) — same rounding as the SQL lut CTE
    QS = Q.reshape(nq, _PQ_M, 8)
    # per-dim rounding happens BEFORE the sum (order-independent
    # exactness contract, same as the SQL lut CTE)
    LUT = (
        _round_half_away(QS[:, :, None, :] * W[None, :, :, :] * 1e12)
        .astype(np.int64)
        .sum(axis=-1)
    )

    def encode_and_score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            XS = X.reshape(len(X), _PQ_M, 8)
            # (n, M, K) scaled-int squared distances; argmin ties to
            # the lowest k, matching row_number(dist_s ASC, k ASC)
            diff = XS[:, :, None, :] - W[None, :, :, :]
            dist = (
                _round_half_away(diff * diff * 1e9)
                .astype(np.int64)
                .sum(axis=-1)
            )
            codes = np.argmin(dist, axis=2)  # (n, M)
            out = []
            for j in range(nq):
                adc = LUT[j][np.arange(_PQ_M), codes].sum(axis=1)
                keep = ids != q_ids[j]
                if not keep.any():
                    continue
                d = pd.DataFrame(
                    {
                        "query_id": int(q_ids[j]),
                        "neighbor_id": ids[keep],
                        "adc_s": adc[keep],
                    }
                )
                # per-batch partial top-5 (ties -> lowest neighbor_id)
                d = d.sort_values(
                    ["adc_s", "neighbor_id"], ascending=[False, True]
                ).head(5)
                out.append(d)
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = emb.mapInPandas(
        encode_and_score, "query_id long, neighbor_id long, adc_s long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_s"), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id", "neighbor_id", "adc_s", F.col("rnk").cast("long").alias("rnk")
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: probe a NEW batch against the EXISTING corpus's
# LSH index — the ingestion-time pattern. A 100 TB pipeline never
# re-dedups the corpus when a crawl wave lands; it probes the wave
# against the materialized band index.
_INCR_DUP_MICRO = 500_000  # jaccard >= 0.5 → duplicate verdict


@register(
    "minhash_incremental_probe",
    f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, i.h AS perm,
         min({_md5_64_sql("i.h || '#' || shingle")}) AS minhash
  FROM doc_shingles, (SELECT unnest(range({N_MINHASH})) AS h) i
  GROUP BY doc_id, i.h
),
bands AS (
  SELECT doc_id, perm // {N_MINHASH // N_BANDS} AS band,
         md5(string_agg(minhash, ',' ORDER BY perm)) AS bucket
  FROM hashed GROUP BY doc_id, band
),
batch AS (
  SELECT DISTINCT doc_id FROM doc_shingles WHERE doc_id % 10 = 0
),
cand AS (
  SELECT DISTINCT p.doc_id AS batch_doc, i.doc_id AS corpus_doc
  FROM bands p JOIN bands i ON p.band = i.band AND p.bucket = i.bucket
  WHERE p.doc_id % 10 = 0 AND i.doc_id % 10 <> 0
),
sizes AS (
  SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id
),
shared AS (
  SELECT c.batch_doc, c.corpus_doc, count(*) AS shared
  FROM cand c
  JOIN doc_shingles a ON a.doc_id = c.batch_doc
  JOIN doc_shingles b ON b.doc_id = c.corpus_doc AND b.shingle = a.shingle
  GROUP BY c.batch_doc, c.corpus_doc
),
scored AS (
  SELECT c.batch_doc, c.corpus_doc,
         CAST(round(CAST(COALESCE(s.shared, 0) AS DOUBLE)
              / (sa.n + sb.n - COALESCE(s.shared, 0)) * 1e6) AS BIGINT) AS jm
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.batch_doc
  JOIN sizes sb ON sb.doc_id = c.corpus_doc
  LEFT JOIN shared s
    ON s.batch_doc = c.batch_doc AND s.corpus_doc = c.corpus_doc
),
best AS (
  SELECT batch_doc, corpus_doc, jm,
         row_number() OVER (PARTITION BY batch_doc
                            ORDER BY jm DESC, corpus_doc ASC) AS rk
  FROM scored
)
SELECT b.doc_id AS batch_doc,
       COALESCE(best.corpus_doc, -1) AS match_doc,
       CAST(COALESCE(best.jm, 0) AS BIGINT) AS jaccard_micro,
       CAST(COALESCE(best.jm, 0) >= {_INCR_DUP_MICRO} AS BIGINT) AS is_dup
FROM batch b
LEFT JOIN best ON best.batch_doc = b.doc_id AND best.rk = 1
""",
)
def minhash_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH dedup probe: treat doc_id % 10 == 0 as
    the NEW BATCH and everything else as the already-ingested corpus;
    band the batch, equijoin against the corpus's band index, verify
    candidates with exact shingle Jaccard, and emit one verdict per
    batch doc — its best corpus match (highest Jaccard, lowest doc_id
    on ties) and an is_dup flag at Jaccard >= 0.5. Batch docs with no
    index hit surface with match_doc = -1 (jaccard 0): the ingestion
    gate must say "new" explicitly, not drop the row (sentinel, not
    NULL, so every output column stays non-null for the driver's
    order-insensitive row sort).

    Scale: this is the shape that makes dedup O(batch) instead of
    O(corpus) per ingest — the corpus index is a materialized table
    (here recomputed because the testdata is static; the banding
    subplan is identical to minhash_bands, which IS that table), the
    probe side shuffles only 4 band rows per batch doc, and the verify
    join is candidate-bounded exactly like minhash_lsh_pairs. In the
    real setting batch << corpus, so the planner broadcasts the probe
    bands; candidates per batch doc are bounded by bucket occupancy."""
    ds = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    bands = _bands_from(spark, ds)
    is_batch = F.col("doc_id") % 10 == 0
    probe = bands.filter(is_batch).select(
        F.col("doc_id").alias("batch_doc"), "band", "bucket"
    )
    index = bands.filter(~is_batch).select(
        F.col("doc_id").alias("corpus_doc"), "band", "bucket"
    )
    cand = (
        probe.join(index, ["band", "bucket"])
        .select("batch_doc", "corpus_doc")
        .distinct()
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    shared = (
        cand.join(ds.withColumnRenamed("doc_id", "batch_doc"), "batch_doc")
        .join(
            ds.select(
                F.col("doc_id").alias("corpus_doc"),
                F.col("shingle").alias("shingle"),
            ),
            ["corpus_doc", "shingle"],
        )
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("batch_doc"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("corpus_doc"), F.col("n").alias("nb"))
    scored = (
        cand.join(sa, "batch_doc")
        .join(sb, "corpus_doc")
        .join(shared, ["batch_doc", "corpus_doc"], "left")
        .withColumn("sh", F.coalesce(F.col("shared"), F.lit(0)))
        .select(
            "batch_doc",
            "corpus_doc",
            F.round(
                F.col("sh").cast("double")
                / (F.col("na") + F.col("nb") - F.col("sh"))
                * 1e6
            )
            .cast("bigint")
            .alias("jm"),
        )
    )
    w = Window.partitionBy("batch_doc").orderBy(
        F.col("jm").desc(), F.col("corpus_doc").asc()
    )
    best = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    batch = ds.filter(is_batch).select(F.col("doc_id").alias("batch_doc")).distinct()
    return batch.join(best, "batch_doc", "left").select(
        "batch_doc",
        F.coalesce(F.col("corpus_doc"), F.lit(-1)).cast("long").alias("match_doc"),
        F.coalesce(F.col("jm"), F.lit(0)).cast("bigint").alias("jaccard_micro"),
        (F.coalesce(F.col("jm"), F.lit(0)) >= _INCR_DUP_MICRO)
        .cast("bigint")
        .alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# IVF-PQ composed index: the production ANN architecture (FAISS
# IVFPQ). IVF bounds WHICH vectors are scored (nprobe cells); PQ
# bounds WHAT is read to score them (4-byte codes, per-query LUTs).
# Reuses the exact centroid/codebook/rounding contracts of ann_ivf_topk
# and ann_pq_adc_topk, so the DuckDB oracle is their CTEs composed.


@register(
    "ann_ivfpq_topk",
    f"""
WITH {_IVF_CENTS_SQL},
{_PQ_CENTS_SQL},
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot_s DESC, cell ASC) AS r
    FROM cellscore
  ) WHERE r = 1
),
qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot_s DESC, cell ASC) AS r
    FROM cellscore WHERE vec_id < 10
  ) WHERE r <= {_IVF_NPROBE}
),
cand AS (
  SELECT q.query_id, a.vec_id AS neighbor_id
  FROM qprobe q JOIN assign a ON a.cell = q.cell
  WHERE a.vec_id <> q.query_id
),
adc AS (
  SELECT p.query_id, p.neighbor_id, CAST(sum(l.dot_s) AS BIGINT) AS adc_s
  FROM cand p
  JOIN codes c ON c.vec_id = p.neighbor_id
  JOIN lut l ON l.query_id = p.query_id AND l.m = c.m AND l.k = c.k
  GROUP BY p.query_id, p.neighbor_id
)
SELECT query_id, neighbor_id, adc_s, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT query_id, neighbor_id, adc_s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_s DESC, neighbor_id ASC) AS rnk
  FROM adc
) WHERE rnk <= 5
""",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 per query: probe the nprobe=4 best IVF cells
    (same centroids + tie rules as ann_ivf_topk), then score ONLY the
    candidates in those cells by PQ-ADC (same codebooks + LUT rounding
    as ann_pq_adc_topk) — never the raw candidate vectors.

    Physical plan: ONE fused numpy mapInPandas pass over the corpus
    does cell-assign + PQ encode + ADC for the queries probing that
    cell, emitting per-batch per-query top-5 partials; the global
    top-5 is one tiny window. Nothing quadratic shuffles. At 1e10
    vectors the corpus is stored partitioned by cell with its 4-byte
    codes precomputed, the scan prunes to probed cells, and the pass
    reads codes instead of vectors — IVF bounds candidates, PQ bounds
    bytes, which is why this is the architecture that fits executor
    memory at scale."""
    import numpy as np
    import pandas as pd

    C = _ivf_centroids()  # (K, 64)
    W = _pq_codebooks()  # (M, K, 8)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def cell_scores(X):
        return np.stack(
            [
                _round_half_away(X * C[c] * 1e9).astype(np.int64).sum(axis=1)
                for c in range(_IVF_K)
            ],
            axis=1,
        )

    qrows = emb.filter(F.col("vec_id") < 10).collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    nq = len(q_ids)
    qs = cell_scores(Q)
    order = np.lexsort((np.arange(_IVF_K)[None, :].repeat(nq, 0), -qs))
    probe = [set(int(c) for c in order[i, :_IVF_NPROBE]) for i in range(nq)]
    QS = Q.reshape(nq, _PQ_M, 8)
    LUT = (
        _round_half_away(QS[:, :, None, :] * W[None, :, :, :] * 1e12)
        .astype(np.int64)
        .sum(axis=-1)
    )

    def fused(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            best = np.argmax(cell_scores(X), axis=1)  # ties -> lowest cell
            XS = X.reshape(len(X), _PQ_M, 8)
            diff = XS[:, :, None, :] - W[None, :, :, :]
            dist = (
                _round_half_away(diff * diff * 1e9).astype(np.int64).sum(axis=-1)
            )
            codes = np.argmin(dist, axis=2)  # (n, M), ties -> lowest code
            out = []
            for j in range(nq):
                keep = np.fromiter(
                    (int(c) in probe[j] for c in best), bool, len(best)
                ) & (ids != q_ids[j])
                if not keep.any():
                    continue
                adc = LUT[j][np.arange(_PQ_M), codes[keep]].sum(axis=1)
                d = pd.DataFrame(
                    {
                        "query_id": int(q_ids[j]),
                        "neighbor_id": ids[keep],
                        "adc_s": adc,
                    }
                ).sort_values(
                    ["adc_s", "neighbor_id"], ascending=[False, True]
                ).head(5)
                out.append(d)
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = emb.mapInPandas(
        fused, "query_id long, neighbor_id long, adc_s long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_s"), F.asc("neighbor_id")
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "adc_s",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
_JACCARD_MICRO_SQL = (
    "CAST(round(CAST(COALESCE(s.shared, 0) AS DOUBLE)"
    " / (sa.n + sb.n - COALESCE(s.shared, 0)) * 1e6) AS BIGINT)"
)


@register(
    "minhash_jaccard_estimate",
    f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, i.h AS perm,
         min({_md5_64_sql("i.h || '#' || shingle")}) AS minhash
  FROM doc_shingles, (SELECT unnest(range({N_MINHASH})) AS h) i
  GROUP BY doc_id, i.h
),
bands AS (
  SELECT doc_id, perm // {N_MINHASH // N_BANDS} AS band,
         md5(string_agg(minhash, ',' ORDER BY perm)) AS bucket
  FROM hashed GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN ha.minhash = hb.minhash THEN 1 ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM cand c
  JOIN hashed ha ON ha.doc_id = c.doc_a
  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.perm = ha.perm
  GROUP BY c.doc_a, c.doc_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM doc_shingles a JOIN doc_shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT g.doc_a, g.doc_b, g.n_agree,
       CAST(g.n_agree * {1000000 // N_MINHASH} AS BIGINT) AS est_micro,
       {_JACCARD_MICRO_SQL} AS jaccard_micro,
       CAST(g.n_agree * {1000000 // N_MINHASH} - {_JACCARD_MICRO_SQL}
            AS BIGINT) AS err_micro
FROM agree g
JOIN sizes sa ON sa.doc_id = g.doc_a
JOIN sizes sb ON sb.doc_id = g.doc_b
LEFT JOIN shared s ON s.doc_a = g.doc_a AND s.doc_b = g.doc_b
""",
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality eval for the dedup family (the ann_recall_at_k
    analog): for every LSH candidate pair, the MinHash Jaccard
    ESTIMATE (agreeing permutations / {N_MINHASH}) next to the exact
    shingle Jaccard, with the signed error. This is how a 100 TB
    pipeline validates its dedup index before trusting it: estimate
    error bounds decide whether {N_MINHASH} permutations suffice for
    the dedup threshold in use.

    Determinism: the estimate is pure integer (n_agree * 62500); the
    exact side reuses the pre-rounded jaccard_micro convention.

    Scale: candidates come from the band-bucket equijoin (never the
    pair space); the estimate join expands candidates by {N_MINHASH}
    fixed rows; the exact verify is candidate-bounded as in
    minhash_lsh_pairs."""
    ds = _doc_shingles(spark, sf_dir).localCheckpoint(eager=True)
    perms = spark.range(N_MINHASH).select(F.col("id").cast("int").alias("perm"))
    hashed = (
        ds.crossJoin(F.broadcast(perms))
        .select(
            "doc_id",
            "perm",
            _md5_64(
                F.concat(F.col("perm").cast("string"), F.lit("#"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
        .localCheckpoint(eager=True)  # feeds banding AND both agree sides
    )
    rows_per_band = N_MINHASH // N_BANDS
    bands = (
        hashed.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("sig")
        )
        .select("doc_id", "band", F.md5("sig").alias("bucket"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = hashed.select(
        F.col("doc_id").alias("doc_a"), "perm", F.col("minhash").alias("mh_a")
    )
    hb = hashed.select(
        F.col("doc_id").alias("doc_b"), "perm", F.col("minhash").alias("mh_b")
    )
    agree = (
        cand.join(ha, "doc_a")
        .join(hb, ["doc_b", "perm"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree")
        )
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    shared = (
        cand.join(ds.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            ds.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        agree.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(shared, ["doc_a", "doc_b"], "left")
        .withColumn("sh", F.coalesce(F.col("shared"), F.lit(0)))
    )
    jac_micro = (
        F.round(
            F.col("sh").cast("double") / (F.col("na") + F.col("nb") - F.col("sh"))
            * 1e6
        ).cast("bigint")
    )
    est_micro = (F.col("n_agree") * (1000000 // N_MINHASH)).cast("bigint")
    return j.select(
        "doc_a",
        "doc_b",
        "n_agree",
        est_micro.alias("est_micro"),
        jac_micro.alias("jaccard_micro"),
        (est_micro - jac_micro).alias("err_micro"),
    )
