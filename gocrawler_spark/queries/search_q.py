r"""Ranked-retrieval and training-mixture queries.

The reference ranks pages by a flat keyword-hit relevance score
(crawler.go:560-585, T11) over its crawled corpus. This module carries
that capability to where a corpus engine actually ends up: a real
inverted index, tf-idf term weighting, BM25 ranked retrieval, and —
on the training-data side — DoReMi-style domain mixture reweighting
and webdataset-style image shard layout.

Determinism (see queries/__init__ header): every float is rounded to
``*_micro`` / ``*_ppm`` BIGINT with the double arithmetic written in
the identical operation order on both engines; cross-row sums are sums
of pre-rounded BIGINTs (order-independent); ``ln``/``sqrt`` agree
across engines (same precedent as ``unigram_lm_nll``); every top-k
uses a total order over (rounded metric, unique key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.functions import text as TX
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.crawler_q import TOKS_SQL

_EN_TOKS_SQL = f"""
  SELECT doc_id, unnest({TOKS_SQL}) AS token
  FROM documents WHERE lang = 'en'
"""


def _en_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return docs.select(
        "doc_id", F.explode(TX.tokens_of(F.lower(F.col("text")))).alias("token")
    )


# ---------------------------------------------------------------------------
@register(
    "inverted_index_stats",
    f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM ({_EN_TOKS_SQL})
  GROUP BY doc_id, token
),
agg AS (
  SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
         CAST(max(tf) AS BIGINT) AS max_tf
  FROM tf GROUP BY token
),
top AS (
  SELECT t.token, min(t.doc_id) AS top_doc
  FROM tf t JOIN agg a ON t.token = a.token AND t.tf = a.max_tf
  GROUP BY t.token
)
SELECT a.token, a.df, a.tf_total, a.max_tf, top.top_doc
FROM agg a JOIN top ON a.token = top.token
WHERE a.df >= 5
ORDER BY a.df DESC, a.token DESC
LIMIT 200
""",
)
def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list statistics: for every term with
    document frequency >= 5, its df, total term frequency, the max
    per-doc tf, and the canonical top posting (lowest doc_id among the
    argmax docs — a deterministic tie-break, not engine luck).

    Scale: per-(doc, token) tf is a map-side-combinable groupBy; the
    term rollup and the argmax join are both keyed on `token`, so at
    scale they share one hash partitioning (at test SF, AQE broadcasts
    the argmax side instead — both shapes are shuffle-minimal).
    Posting lists are never materialized as arrays; everything stays
    relational, which is exactly how a 1e10-doc index build stays
    bounded."""
    tf = (
        _en_toks(spark, sf_dir)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.max("tf").alias("max_tf"),
    )
    top = (
        tf.join(agg.select("token", "max_tf"), "token")
        .filter(F.col("tf") == F.col("max_tf"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("top_doc"))
    )
    return (
        agg.join(top, "token")
        .filter(F.col("df") >= 5)
        .select("token", "df", "tf_total", "max_tf", "top_doc")
        .orderBy(F.desc("df"), F.desc("token"))
        .limit(200)
    )


# ---------------------------------------------------------------------------
_BM25_TERMS = ("join", "window", "vector", "spark")
_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_topk",
    f"""
WITH toks AS ({_EN_TOKS_SQL}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tot AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
qtf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM toks WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
dfs AS (SELECT token, count(*) AS df FROM qtf GROUP BY token),
idf AS (
  SELECT token,
         CAST(round(1000000.0 * ln(
           (CAST(t.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0
         )) AS BIGINT) AS idf_micro
  FROM dfs, tot t
),
contrib AS (
  SELECT q.doc_id,
         CAST(round(
           CAST(i.idf_micro AS DOUBLE) * (q.tf * 2.2)
           / (CAST(q.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                        / (CAST(t.sum_dl AS DOUBLE) / CAST(t.n_docs AS DOUBLE)))))
         ) AS BIGINT) AS c
  FROM qtf q JOIN dl d ON q.doc_id = d.doc_id
             JOIN idf i ON q.token = i.token, tot t
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro, count(*) AS n_terms
FROM contrib GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC
LIMIT 10
""",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed 4-term query
    — the principled upgrade of the reference's flat keyword-hit score
    (crawler.go:560-585). Robertson idf = ln(1 + (N - df + .5)/(df +
    .5)), per-(doc, term) contributions rounded to integer micro before
    the per-doc sum so ranking is engine-exact.

    Scale: query-term postings are filtered directly above the token
    explode, BEFORE any aggregation or shuffle (a real index would
    seek the postings; a scan-time engine can do no better than
    filter-first), so the scored relation is O(docs containing a
    query term), not O(corpus tokens); idf and
    the corpus stats (N, avgdl) are tiny dims joined by broadcast. The
    one big shuffle is the per-doc tf groupBy. Doc lengths (`dl`) would
    be a precomputed column of a real index — here they are derived in
    the same job from the same scan."""
    toks = _en_toks(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tot = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qtf = (
        toks.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = dfs.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.lit(1000000.0)
            * F.log(
                (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
        )
        .cast("long")
        .alias("idf_micro"),
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    contrib = (
        qtf.join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(idf), "token")
        .select(
            "doc_id",
            F.round(
                F.col("idf_micro").cast("double")
                * (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * (F.col("dl").cast("double") / avgdl)
                    )
                )
            )
            .cast("long")
            .alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("score_micro"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
@register(
    "tfidf_topterms",
    f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM ({_EN_TOKS_SQL})
  GROUP BY doc_id, token
),
dfs AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
tot AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT t.doc_id, t.token,
         CAST(round(1000000.0 * t.tf
              * ln(CAST(x.n_docs AS DOUBLE) / d.df)) AS BIGINT)
           AS tfidf_micro
  FROM tf t JOIN dfs d ON t.token = d.token, tot x
)
SELECT doc_id, rnk, token, tfidf_micro FROM (
  SELECT doc_id, token, tfidf_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_micro DESC, token ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
""",
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf-idf terms (idf = ln(N/df)) — the document
    fingerprint a retrieval or clustering stage keys on. Scores are
    micro-rounded BEFORE ranking and ties break on the term string, so
    the top-3 set is engine-exact.

    Scale: tf and df share the token-keyed shuffle (exchange reuse);
    the df relation is vocabulary-sized — joined on token as a plain
    shuffle join because vocabulary at 100 TB (1e9+ types) is NOT
    broadcastable, exactly the case where hinting broadcast would be
    wrong. The per-doc top-3 is a partitioned window, no global sort."""
    tf = (
        _en_toks(spark, sf_dir)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tot = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfs, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "token",
            F.round(
                F.lit(1000000.0)
                * F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            )
            .cast("long")
            .alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "token", "tfidf_micro")
    )


# ---------------------------------------------------------------------------
@register(
    "domain_mixture_weights",
    f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({TOKS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
g AS (
  SELECT source, n_docs, n_tokens,
         CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
         count(*) OVER () AS k,
         CAST(round(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)
              / CAST(sum(n_tokens) OVER () AS BIGINT))) AS BIGINT) AS s_micro
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST(round(1000000.0 * n_tokens / tot) AS BIGINT) AS share_ppm,
       CAST(round(1000000.0 * tot / (k * n_tokens)) AS BIGINT) AS weight_micro,
       CAST(round(1000000.0 * s_micro / (CAST(sum(s_micro) OVER () AS BIGINT)))
         AS BIGINT) AS tau_share_ppm
FROM g
""",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite training-mixture reweighting: per source, its token
    share, the uniform-target resampling weight (target/observed), and
    a temperature-flattened (tau = 0.5, i.e. sqrt) share renormalized
    the order-independent way — per-source sqrt shares are micro-
    rounded FIRST, then summed as exact BIGINTs, so the normalizer
    never depends on float association order.

    Scale: one map-side-combinable groupBy on `source`; the stratum
    relation is one row per source (tiny), so the OVER () windows are
    windows over a dim table, not the corpus. At 100 TB this is the
    cheapest query in the pipeline and the one that steers everything
    downstream."""
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(TX.tokens_of(F.lower(F.col("text")))))
        .cast("long")
        .alias("n_tokens"),
    )
    w0 = Window.partitionBy()
    g = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w0).cast("long").alias("tot"),
        F.count(F.lit(1)).over(w0).alias("k"),
        F.round(
            F.lit(1000000.0)
            * F.sqrt(
                F.col("n_tokens").cast("double")
                / F.sum("n_tokens").over(w0).cast("long")
            )
        )
        .cast("long")
        .alias("s_micro"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.lit(1000000.0) * F.col("n_tokens") / F.col("tot"))
        .cast("long")
        .alias("share_ppm"),
        F.round(
            F.lit(1000000.0) * F.col("tot") / (F.col("k") * F.col("n_tokens"))
        )
        .cast("long")
        .alias("weight_micro"),
        F.round(
            F.lit(1000000.0)
            * F.col("s_micro")
            / F.sum("s_micro").over(w0).cast("long")
        )
        .cast("long")
        .alias("tau_share_ppm"),
    )


# ---------------------------------------------------------------------------
_SHARD_BYTES = 65536


def _image_shard_sql() -> str:
    # derive (iid, pixel_bytes, fmt) in SQL exactly as the payload path
    # does — shared w/h derivation lives in image_q.wh_case_sql
    from gocrawler_spark.queries.image_q import N_DOCS, wh_case_sql

    return f"""
WITH dims AS (
  SELECT doc_id AS iid,
         CASE WHEN doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
         {wh_case_sql("doc_id")}
  FROM documents WHERE doc_id < {N_DOCS}
),
spans AS (
  SELECT iid, fmt, CAST(w * h * 3 AS BIGINT) AS px,
         CAST(sum(w * h * 3) OVER (ORDER BY iid
              ROWS UNBOUNDED PRECEDING) - w * h * 3 AS BIGINT) AS start_off
  FROM dims
)
SELECT start_off // {_SHARD_BYTES} AS shard_id,
       count(*) AS n_images,
       CAST(sum(px) AS BIGINT) AS pixel_bytes,
       CAST(sum(CASE WHEN fmt = 'qjpg' THEN 1 ELSE 0 END) AS BIGINT) AS n_qjpg,
       min(iid) AS first_id, max(iid) AS last_id
FROM spans
GROUP BY shard_id
"""


@register("image_shard_packing", _image_shard_sql())
def image_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webdataset-style image shard layout over the input_hint payload
    table: images in ingest order are assigned to fixed-byte-budget
    training shards by the first-byte rule (shard = start_offset //
    budget over the decoded-pixel byte stream — the image-axis sibling
    of `sequence_packing`'s concat-and-chunk). Per shard: image count,
    pixel-byte fill, lossy/lossless mix, and the id span (webdataset
    shards are contiguous id ranges by construction — this column pair
    is the check).

    Scale: the Spark side reads w/h/fmt from the REAL payload table
    (mapInPandas decode path — payload bytes never shuffle; only the
    3-column metadata projection enters the cumsum). The cumsum is the
    hierarchical two-pass prefix sum (operators/prefix.py:
    bucket-local cumsum + broadcast per-bucket offsets), NOT a
    single-partition global window — same operator as
    `sequence_packing`."""
    from gocrawler_spark.operators.prefix import exclusive_prefix_sum
    from gocrawler_spark.queries.image_q import images_from_documents

    imgs = images_from_documents(spark, sf_dir).select(
        F.col("image_id").cast("long").alias("iid"), "w", "h", "fmt"
    )
    px = (F.col("w") * F.col("h") * F.lit(3)).cast("long")
    spans = exclusive_prefix_sum(
        imgs.select("iid", "fmt", px.alias("px")), "iid", "px", "start_off"
    )
    return (
        spans.withColumn("shard_id", F.expr(f"start_off div {_SHARD_BYTES}"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("px").cast("long").alias("pixel_bytes"),
            F.sum((F.col("fmt") == "qjpg").cast("int"))
            .cast("long")
            .alias("n_qjpg"),
            F.min("iid").alias("first_id"),
            F.max("iid").alias("last_id"),
        )
    )


from gocrawler_spark.queries.image_q import N_DOCS  # noqa: E402
from gocrawler_spark.queries.image_q import wh_case_sql  # noqa: E402

_WH_CASE = wh_case_sql("doc_id")


@register(
    "wds_export_stats",
    f"""
WITH dims AS (
  SELECT doc_id AS iid,
         CASE WHEN doc_id % 3 = 0 THEN 'qjpg' ELSE 'png' END AS fmt,
         strlen(substr(text, 1, 64)) AS cap_bytes,
         {_WH_CASE}
  FROM documents WHERE doc_id < {N_DOCS}
),
spans AS (
  SELECT iid, fmt, cap_bytes,
         CAST(sum(w * h * 3) OVER (ORDER BY iid
              ROWS UNBOUNDED PRECEDING) - w * h * 3 AS BIGINT) AS start_off
  FROM dims
)
SELECT start_off // {_SHARD_BYTES} AS shard_id,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(iid) AS BIGINT) AS sum_ids,
       CAST(sum(cap_bytes) AS BIGINT) AS sum_caption_bytes,
       CAST(sum(CASE WHEN fmt = 'qjpg' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_qjpg
FROM spans
GROUP BY shard_id ORDER BY shard_id
""",
)
def wds_export_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset round trip under the oracle gate: export the payload
    table as deterministic tar shards (sinks/wds.py — the interchange
    format image+caption training loaders actually consume), read the
    tars BACK through the binaryFile source + stdlib tarfile, and
    aggregate per shard. Counts, id sums, caption byte sums, and the
    lossy mix must match the first-byte-rule assignment stated
    relationally — so the sink's bytes, the source's parse, and the
    packing rule are all under one check."""
    from gocrawler_spark.queries.image_q import images_from_documents
    from gocrawler_spark.queries.warc_q import _fresh_scratch
    from gocrawler_spark.sinks import wds as WDS

    scratch = _fresh_scratch("wds_export_q")
    imgs = images_from_documents(spark, sf_dir)
    WDS.export_webdataset(imgs, scratch, shard_bytes=_SHARD_BYTES).collect()
    back = WDS.read_webdataset(spark, scratch)
    return (
        back.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("iid").alias("sum_ids"),
            F.sum(F.octet_length("caption")).alias("sum_caption_bytes"),
            F.sum((F.col("fmt") == "qjpg").cast("long")).alias("n_qjpg"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection via importance resampling (Xie et al. 2023):
# hashed-ngram bag features, target-vs-raw log-likelihood-ratio weights.
_DSIR_B = 512  # hashed feature buckets (unigrams + bigrams share the space)
_DSIR_TARGET = "src0"  # the "high-quality target domain" stratum
_DSIR_TOPK = 50

_DSIR_H_SQL = "CAST(('0x' || substr(md5({e}),1,15)) AS BIGINT) % " + str(_DSIR_B)
_DSIR_FEATS_SQL = f"""
  SELECT doc_id, source, unnest(list_concat(
    list_transform(toks, t -> {_DSIR_H_SQL.format(e='t')}),
    CASE WHEN len(toks) > 1 THEN
      list_transform(range(1, len(toks)),
        i -> {_DSIR_H_SQL.format(e="toks[i] || ' ' || toks[i+1]")})
    ELSE CAST([] AS BIGINT[]) END)) AS bucket
  FROM (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents)
"""


def _dsir_feats(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket): hashed unigram + bigram features, one
    codegen projection + explode — no Python, no shuffle."""
    b = _DSIR_B
    h = "pmod(cast(conv(substr(md5({e}),1,15),16,10) as bigint), " + str(b) + ")"
    bigram = "concat(__toks[i-1], ' ', __toks[i])"
    buckets = F.expr(
        "concat("
        + f"  transform(__toks, t -> {h.format(e='t')}),"
        + "  if(size(__toks) > 1,"
        + "     transform(sequence(1, size(__toks) - 1),"
        + f"       i -> {h.format(e=bigram)}),"
        + "     cast(array() as array<bigint>)))"
    )
    return docs.withColumn("__toks", TX.tokens_of(F.lower(F.col("text")))).select(
        "doc_id", "source", F.explode(buckets).alias("bucket")
    )


_DSIR_SCORES_CTES = f"""feats AS ({_DSIR_FEATS_SQL}),
ct AS (SELECT bucket, count(*) AS c_t FROM feats
       WHERE source = '{_DSIR_TARGET}' GROUP BY bucket),
cr AS (SELECT bucket, count(*) AS c_r FROM feats
       WHERE source <> '{_DSIR_TARGET}' GROUP BY bucket),
base AS (SELECT CAST(range AS BIGINT) AS bucket FROM range({_DSIR_B})),
counts AS (
  SELECT b.bucket, CAST(coalesce(ct.c_t, 0) AS BIGINT) AS c_t,
         CAST(coalesce(cr.c_r, 0) AS BIGINT) AS c_r
  FROM base b LEFT JOIN ct ON b.bucket = ct.bucket
              LEFT JOIN cr ON b.bucket = cr.bucket
),
tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS t_tot,
               CAST(sum(c_r) AS BIGINT) AS r_tot FROM counts),
llr AS (
  SELECT bucket, CAST(round(1000000.0 * ln(
           CAST((c_t + 1) * (r_tot + {_DSIR_B}) AS DOUBLE)
           / CAST((c_r + 1) * (t_tot + {_DSIR_B}) AS DOUBLE))) AS BIGINT)
         AS llr_micro
  FROM counts, tot
),
scores AS (
  SELECT f.doc_id, f.source, count(*) AS n_feats,
         CAST(sum(l.llr_micro) AS BIGINT) AS score_micro
  FROM feats f JOIN llr l ON f.bucket = l.bucket
  WHERE f.source <> '{_DSIR_TARGET}'
  GROUP BY f.doc_id, f.source
)"""


@register(
    "dsir_importance_weights",
    f"""
WITH {_DSIR_SCORES_CTES}
SELECT doc_id, source, n_feats, score_micro
FROM scores ORDER BY score_micro DESC, doc_id ASC LIMIT {_DSIR_TOPK}
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score
    every raw-pool document by how much its hashed-ngram bag looks like
    the target domain. Features = md5-hashed unigrams+bigrams into
    {B} buckets; bucket models are Laplace(+1)-smoothed multinomials
    fit on the target stratum (source = src0) vs the raw pool; the
    per-bucket log-likelihood ratio is micro-rounded ONCE (512-row
    table), and each doc's importance weight is an exact BIGINT sum of
    those pre-rounded llrs over its feature occurrences — order-
    independent, so Spark and DuckDB agree bit-for-bit. Top-50 by
    (weight desc, doc_id) = the selected training subset.

    Scale: feature extraction is a projection (no Python); the bucket
    model is a 512-row groupBy (map-side combine) → broadcast; scoring
    is scan + broadcast-hash-join + one groupBy(doc_id) — one wide
    shuffle total at 100 TB, and the llr table is O(B) regardless of
    corpus size. The reference has no selection stage (it crawls
    topically via keyword score, crawler.go:560-585); this is the
    modern replacement that the curated corpus feeds."""
    scores = _dsir_scores(spark, sf_dir)
    return scores.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_TOPK)


def _dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_feats, score_micro) for every raw-pool doc —
    the shared body of the two DSIR queries (Spark twin of
    _DSIR_SCORES_CTES)."""
    docs = load(spark, sf_dir, "documents")
    feats = _dsir_feats(docs)
    b = _DSIR_B
    # BOTH bucket models from ONE tokenize+hash pass (conditional
    # sums), not two separate filtered groupBys — at 100 TB the corpus
    # scan is the cost, so the model fit is one pass and the scoring
    # join below is the only other one.
    both = feats.groupBy("bucket").agg(
        F.sum((F.col("source") == _DSIR_TARGET).cast("long")).alias("c_t"),
        F.sum((F.col("source") != _DSIR_TARGET).cast("long")).alias("c_r"),
    )
    base = spark.range(b).select(F.col("id").alias("bucket"))
    counts = base.join(F.broadcast(both), "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("c_t"), F.lit(0)).cast("long").alias("c_t"),
        F.coalesce(F.col("c_r"), F.lit(0)).cast("long").alias("c_r"),
    )
    tot = counts.agg(
        F.sum("c_t").cast("long").alias("t_tot"),
        F.sum("c_r").cast("long").alias("r_tot"),
    )
    llr = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.lit(1000000.0)
            * F.log(
                ((F.col("c_t") + 1) * (F.col("r_tot") + b)).cast("double")
                / ((F.col("c_r") + 1) * (F.col("t_tot") + b)).cast("double")
            )
        )
        .cast("long")
        .alias("llr_micro"),
    )
    return (
        feats.filter(F.col("source") != _DSIR_TARGET)
        .join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("llr_micro").cast("long").alias("score_micro"),
        )
    )


@register(
    "dsir_resample_topk",
    f"""
WITH {_DSIR_SCORES_CTES},
keyed AS (
  SELECT doc_id, source, score_micro,
         CAST(round(1000000.0 * -ln(-ln(
           (CAST(('0x' || substr(md5('dsir#' || CAST(doc_id AS VARCHAR)),1,15))
              AS BIGINT) % 1000000 + 0.5) / 1000000.0))) AS BIGINT)
         AS gumbel_micro
  FROM scores
)
SELECT doc_id, source, score_micro, gumbel_micro,
       score_micro + gumbel_micro AS key_micro
FROM keyed ORDER BY key_micro DESC, doc_id ASC LIMIT {_DSIR_TOPK}
""",
)
def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's resampling step: sample k docs WITHOUT replacement with
    probability ∝ exp(importance weight) via the Gumbel-top-k trick —
    key = score + Gumbel(0,1), take the k largest keys. The Gumbel
    noise is deterministic (u from md5('dsir#'||doc_id) in (0,1),
    g = -ln(-ln(u))) so runs, engines, and partitionings all agree;
    both score and noise live in micro-nats so the key is an exact
    BIGINT sum of two pre-rounded BIGINTs.

    Scale: adds one stateless projection + the same TakeOrderedAndProject
    to the scoring plan — per-doc noise needs no shuffle, no RNG state,
    and no driver coordination, which is why Gumbel-top-k (not
    df.sample + weights) is the 100 TB-safe way to draw a weighted
    training subset."""
    scores = _dsir_scores(spark, sf_dir)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dsir#"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
            + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    keyed = scores.select(
        "doc_id",
        "source",
        "score_micro",
        F.round(F.lit(1000000.0) * -F.log(-F.log(u))).cast("long").alias(
            "gumbel_micro"
        ),
    )
    return keyed.select(
        "doc_id",
        "source",
        "score_micro",
        "gumbel_micro",
        (F.col("score_micro") + F.col("gumbel_micro")).alias("key_micro"),
    ).orderBy(F.col("key_micro").desc(), F.col("doc_id").asc()).limit(_DSIR_TOPK)
