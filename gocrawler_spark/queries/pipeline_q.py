"""Training-data pipeline queries beyond per-pair dedup: cluster
formation, mixture sampling, and benchmark decontamination.

These are the steps a 100 TB curation pipeline runs AFTER the pairwise
near-dup detectors (dedup_q):

- ``dedup_clusters``: pairs -> connected components -> canonical doc.
  A doc can be near-dup of B and B of C without A~C ever scoring a
  pair; keeping "first of each pair" would then keep two of the three.
  Components are the correct dedup unit (the reference's P5 keeps the
  first doc per signature, crawler.go:1248-1255 — this generalizes
  that "first wins" rule to the transitive closure over ALL near-dup
  evidence).
- ``sample_stratified``: deterministic per-(source, lang) stratum
  sampling for training mixtures — rank by md5(doc_id) inside each
  stratum and keep the top ceil(20%). Hash-ranked sampling is
  reproducible across runs/engines and immune to partitioning order,
  unlike ``df.sample`` (seeded per-partition => changes when the
  partitioning does).
- ``decontaminate_overlap``: count distinct analyzer shingles each
  training doc shares with a held-out benchmark source; any overlap
  flags the doc. The standard eval-contamination sweep, expressed as
  one distinct-shingle equijoin.

Scale notes per query in the docstrings; all heavy work is joins and
partial aggregations — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gocrawler_spark.functions import text as TX
from gocrawler_spark.queries import ORACLES, QUERIES, load, memo_result, register
from gocrawler_spark.queries.crawler_q import (
    CFG,
    STOP_RX,
    TOKS_SQL,
    _SIG_SQL,
    _signatures,
)
from gocrawler_spark.queries.dedup_q import SHINGLE_N

# The near-dup edge set: shingle-Jaccard pairs (dedup_ngram_jaccard,
# already df-capped and thresholded) UNION P5 signature-equal pairs
# expressed as STARS (doc -> its group's min doc), not cliques — a
# signature group of size g contributes g-1 edges, not g*(g-1)/2, and
# star edges are CC-equivalent to the clique.
_CC_MAX_ITERS = 30


def connected_components(
    pairs: DataFrame, local_max_edges: int = 5_000_000
) -> DataFrame:
    """Connected components over an undirected edge list
    ``(doc_a, doc_b)``; returns ``(doc_id, cluster_id)`` for every
    node that appears in an edge, cluster_id = min node id in the
    component.

    Hybrid by measured edge count — the defining property of a
    near-dup pair graph is that it is orders of magnitude smaller
    than the corpus that produced it (pairs are candidate-bounded by
    LSH buckets / signature groups), so:

    - ``<= local_max_edges`` (default 5M ≈ ~80 MB of longs): one
      executor task runs union-find with path compression over the
      whole edge list via ``applyInPandas`` — O(E α(E)), one job, no
      iteration. This is not a driver collect; the work runs on an
      executor and only (doc_id, cluster_id) rows come back.
    - above the threshold: distributed min-label propagation to a
      fixed point — per round one shuffle (labels -> edges join on
      src) + a partial-agg min per dst, ``localCheckpoint``
      truncating the loop's lineage, rounds bounded by component
      diameter. Nothing gathers to the driver beyond the 1-row
      convergence probe.

    Both paths emit identical labels (min id per component).
    """
    # dedup at the PAIR level (half the rows), then symmetrize — the
    # (a<b) + swapped copies are distinct by construction, so no second
    # distinct over the doubled set is needed
    p = (
        pairs.select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    if p.count() <= local_max_edges:
        return _cc_union_find_single_task(p)

    edges = (
        p.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            p.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        # hash-partition on the join key ONCE: every round's
        # labels->edges join then reuses this layout and only the
        # (smaller) label frame moves per round
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_CC_MAX_ITERS):
        prop = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        # lazy checkpoint: the convergence probe below materializes it,
        # so each round costs ONE job, and the probe's aggregation is a
        # 1-row boolean (nothing gathers to the driver)
        nxt = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_min") < F.col("comp")).alias("_moved"),
            )
            .localCheckpoint(eager=False)
        )
        moved = nxt.filter(F.col("_moved")).limit(1).count()
        labels = nxt.drop("_moved")
        if moved == 0:
            break
    return labels.select("doc_id", F.col("comp").alias("cluster_id"))


def _cc_union_find_single_task(p: DataFrame) -> DataFrame:
    """Union-find over the whole (deduped) edge list in ONE executor
    task: union by min id + path compression, so the root of every
    set is its minimum member and lookups are near-O(1) amortized."""

    def uf(pdf):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # min-id root
        import pandas as pd

        nodes = list(parent)
        return pd.DataFrame(
            {"doc_id": nodes, "cluster_id": [find(x) for x in nodes]}
        )

    return (
        p.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(uf, "doc_id long, cluster_id long")
    )


def _edge_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    jac = (
        QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
        .select("doc_a", "doc_b")
    )
    sigs = _signatures(spark, sf_dir)
    mins = sigs.groupBy("signature").agg(F.min("doc_id").alias("m"))
    stars = (
        sigs.join(mins, "signature")
        .filter(F.col("doc_id") != F.col("m"))
        .select(F.col("m").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return jac.unionByName(stars).distinct()


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE
jp AS (SELECT doc_a, doc_b FROM ({ORACLES['dedup_ngram_jaccard']}) j),
sigs AS ({_SIG_SQL}),
mins AS (SELECT signature, min(doc_id) AS m FROM sigs GROUP BY signature),
sp AS (
  SELECT mins.m AS doc_a, sigs.doc_id AS doc_b
  FROM sigs JOIN mins USING (signature)
  WHERE sigs.doc_id <> mins.m
),
edges0 AS (SELECT doc_a, doc_b FROM jp UNION SELECT doc_a, doc_b FROM sp),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges0
  UNION SELECT doc_b, doc_a FROM edges0
),
nodes AS (
  SELECT DISTINCT src AS doc_id FROM edges
),
reach(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.doc_id
),
labels AS (
  SELECT doc_id, min(comp) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT l.doc_id, l.cluster_id,
       count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       CAST(l.doc_id = l.cluster_id AS BIGINT) AS is_canonical
FROM labels l
""",
)
@memo_result
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup evidence graph
    (Jaccard pairs + P5 signature stars); cluster_id = min doc_id in
    the component = the transitive "first wins" canonical doc.

    Spark path: the measured-size hybrid in connected_components —
    single-task union-find for pair graphs under the edge threshold
    (the common case: near-dup pairs are candidate-bounded, orders of
    magnitude smaller than the corpus), distributed min-label
    propagation above it (one labels->edges shuffle per round,
    lineage-truncated, rounds bounded by component diameter; nothing
    gathers to the driver on either path). Both paths emit identical
    min-id labels — asserted in tests/test_pipeline.py."""
    out = connected_components(_edge_frames(spark, sf_dir))
    return out.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).cast("long").alias(
            "is_canonical"
        ),
    )


# ---------------------------------------------------------------------------
_SAMPLE_RATE = 0.2


@register(
    "sample_stratified",
    f"""
WITH r AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source, lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY source, lang) AS n
  FROM documents
)
SELECT doc_id, source, lang, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= ceil(n * {_SAMPLE_RATE})
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: within each (source, lang)
    stratum rank docs by md5(doc_id) and keep the top ceil(20%).

    One shuffle on the stratum key; the md5 rank makes the sample a
    pure function of doc_id (stable across runs, partitionings, and
    engines — both engines emit identical lowercase-hex md5). At
    100 TB a mega-stratum makes the single-partition window the
    bottleneck; the fix is rank-free two-phase sampling (keep
    md5-prefix < rate, then trim the small overshoot), which this
    column design supports unchanged."""
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    strat = Window.partitionBy("source", "lang")
    r = docs.select(
        "doc_id",
        "source",
        "lang",
        F.row_number().over(strat.orderBy(key, "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(strat).alias("n"),
    )
    return r.filter(
        F.col("rn") <= F.ceil(F.col("n") * F.lit(_SAMPLE_RATE))
    ).select("doc_id", "source", "lang", F.col("rn").cast("long").alias("rn"))


# ---------------------------------------------------------------------------
_BENCH_SOURCE = "src0"

_SRC_SHINGLES_CTE = f"""
toklists AS (
  SELECT doc_id, source,
         list_filter({TOKS_SQL}, t -> NOT regexp_matches(t, '{STOP_RX}')) AS L
  FROM documents WHERE lang = 'en'
),
shingles AS (
  SELECT doc_id, source, L[i] || ' ' || L[i+1] || ' ' || L[i+2] AS shingle
  FROM (SELECT doc_id, source, L, unnest(range(1, len(L) - 1)) AS i
        FROM toklists WHERE len(L) >= {SHINGLE_N})
),
ds AS (SELECT DISTINCT doc_id, source, shingle FROM shingles)
"""


@register(
    "decontaminate_overlap",
    f"""
WITH {_SRC_SHINGLES_CTE},
bench AS (SELECT DISTINCT shingle FROM ds WHERE source = '{_BENCH_SOURCE}'),
train AS (SELECT doc_id, shingle FROM ds WHERE source <> '{_BENCH_SOURCE}'),
hits AS (
  SELECT doc_id, count(*) AS n
  FROM train JOIN bench USING (shingle) GROUP BY doc_id
),
tdocs AS (SELECT DISTINCT doc_id FROM train)
SELECT t.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared,
       CAST(COALESCE(h.n, 0) > 0 AS BIGINT) AS contaminated
FROM tdocs t LEFT JOIN hits h USING (doc_id)
""",
)
@memo_result
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc (source != bench),
    the number of distinct analyzer shingles it shares with the
    benchmark source's shingle set, and a contaminated flag.

    Scale: distinct-shingle sets on both sides, then one equijoin on
    the shingle + a partial-agg count per doc — the join shuffles on
    the shingle key exactly once and the benchmark side is typically
    orders of magnitude smaller than training (broadcast when it fits;
    here the planner decides). No per-row Python anywhere."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    L = TX.analyzed_tokens(F.col("text"), CFG)
    base = docs.select("doc_id", "source", L.alias("L")).filter(
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
    ds = base.select(
        "doc_id", "source", F.explode(F.array_distinct(grams)).alias("shingle")
    )
    bench = (
        ds.filter(F.col("source") == _BENCH_SOURCE).select("shingle").distinct()
    )
    train = ds.filter(F.col("source") != _BENCH_SOURCE).select(
        "doc_id", "shingle"
    )
    hits = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tdocs = train.select("doc_id").distinct()
    return tdocs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce(F.col("n"), F.lit(0)) > 0).cast("long").alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
@register(
    "embedding_dedup_clusters",
    f"""
WITH RECURSIVE
ep AS (SELECT vec_a AS doc_a, vec_b AS doc_b
       FROM ({ORACLES['embedding_cosine_near_dups']}) e),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ep
  UNION SELECT doc_b, doc_a FROM ep
),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, comp) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.doc_id
),
labels AS (
  SELECT doc_id, min(comp) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT l.doc_id AS vec_id, l.cluster_id,
       count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       CAST(l.doc_id = l.cluster_id AS BIGINT) AS is_canonical
FROM labels l
""",
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: connected components over the
    LSH-bucketed embedding-cosine near-dup pairs; cluster_id = min
    vec_id (the transitive "first wins" canonical), cluster_size and
    an is_canonical flag per vector.

    Scale: pairs are bucket-bounded (embedding_cosine_near_dups) and
    the component pass is the measured-size hybrid CC
    (connected_components) — the embedding twin of dedup_clusters."""
    pairs = QUERIES["embedding_cosine_near_dups"](spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    cc = connected_components(pairs)
    return cc.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).cast("long").alias(
            "is_canonical"
        ),
    )


# ---------------------------------------------------------------------------
_SPAN_K = 8  # tokens per exact-dup span (Lee et al. use 50 BPE tokens;
#              8 whitespace words keeps the testdata non-degenerate)


@register(
    "span_dedup_coverage",
    f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS W
  FROM documents
),
s AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(W[i:i+{_SPAN_K - 1}], ' ') AS span
  FROM (SELECT doc_id, W, unnest(range(1, len(W) - {_SPAN_K} + 2)) AS i
        FROM w WHERE len(W) >= {_SPAN_K})
),
win AS (SELECT span, min(ROW(doc_id, pos)) AS wk FROM s GROUP BY span),
dup AS (
  SELECT s.doc_id, s.pos FROM s JOIN win ON s.span = win.span
  WHERE s.doc_id <> win.wk[1] OR s.pos <> win.wk[2]
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {_SPAN_K}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS ni
  FROM dup
),
isl2 AS (
  SELECT doc_id, pos,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
),
cov AS (
  SELECT doc_id, island,
         max(pos) + {_SPAN_K} - min(pos) AS ilen, count(*) AS n_occ
  FROM isl2 GROUP BY doc_id, island
),
agg AS (
  SELECT doc_id, sum(ilen) AS cov, sum(n_occ) AS n_dup
  FROM cov GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(len(w.W) AS BIGINT) AS n_tokens,
       CAST(greatest(len(w.W) - {_SPAN_K} + 1, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(agg.n_dup, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(agg.cov, 0) AS BIGINT) AS dup_cov_tokens
FROM documents d
JOIN w ON d.doc_id = w.doc_id
LEFT JOIN agg ON d.doc_id = agg.doc_id
""",
)
def span_dedup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span coverage (the suffix-array span-dedup
    signal of Lee et al. 2021, approximated with fixed-k token spans):
    for every k-token span of every doc, the globally FIRST occurrence
    (lowest (doc_id, pos)) wins; every later occurrence marks its
    [pos, pos+k) token interval as duplicated. Per doc: token count,
    span count, number of duplicated span occurrences, and the
    interval-UNION of duplicated spans in tokens (the text a span-level
    dedup pass would actually cut — overlapping spans are not double
    counted, via the gaps-and-islands running-max window).

    Complements the doc-level detectors (minhash/simhash/jaccard):
    span dedup catches boilerplate shared by otherwise-distinct docs.

    Scale: one groupBy on the span (partial-agg min — map-side combine
    absorbs hot boilerplate spans), one join back on the span (1:N with
    N on the probe side — no pair explosion), one per-doc window. At
    100 TB, group on xxhash64(span) instead of the span string to
    shuffle 8 bytes per occurrence; collisions only merge spans (rate
    ~n²/2⁶⁴), acceptable for a cut-list. The window partitions by
    doc_id — bounded by doc length, never corpus-wide."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("W"),
    )
    spans = toks.filter(F.size("W") >= _SPAN_K).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("W") - (_SPAN_K - 1)),
                lambda i: F.array_join(F.slice("W", i, _SPAN_K), " "),
            )
        ).alias("pos", "span"),
    )
    # winner = lexicographic min of (doc_id, pos) as a STRUCT, not an
    # arithmetic doc_id * 2^31 + pos key: the packed key overflows
    # int64 once doc_id >= 2^32 (well inside the 1e10-doc target),
    # silently electing a late occurrence in Spark and erroring in
    # DuckDB. Struct min orders lexicographically in both engines.
    win = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "pos")).alias("wk")
    )
    dup = (
        spans.join(win, "span")
        .filter(
            (F.col("doc_id") != F.col("wk.doc_id"))
            | (F.col("pos") != F.col("wk.pos"))
        )
        .select("doc_id", "pos")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + _SPAN_K).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.withColumn(
        "ni",
        (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("long"),
    ).withColumn(
        "island",
        F.sum("ni").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    cov = isl.groupBy("doc_id", "island").agg(
        (F.max("pos") + _SPAN_K - F.min("pos")).alias("ilen"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    agg = cov.groupBy("doc_id").agg(
        F.sum("ilen").alias("cov"), F.sum("n_occ").alias("n_dup")
    )
    base = toks.select(
        "doc_id",
        F.size("W").cast("long").alias("n_tokens"),
        F.greatest(F.size("W") - (_SPAN_K - 1), F.lit(0))
        .cast("long")
        .alias("n_spans"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("cov"), F.lit(0)).cast("long").alias(
            "dup_cov_tokens"
        ),
    )
