r"""Semantic deduplication via learned k-means clustering (SemDeDup).

The scale path for embedding-space dedup of web-crawled training data
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): cluster the corpus
with k-means, then search for near-duplicates ONLY within each
cluster — the quadratic pair space shrinks from O(n²) to
O(sum_c n_c²), and the clustering itself is linear passes.

This module adds the piece the rest of the similarity stack does not
have: LEARNED centroids. `ann_ivf_topk` / `ann_pq_adc_topk` quantize
against fixed md5-derived codebooks (deterministic stand-ins for a
trained coarse quantizer); here the centroids are actually fit with
Lloyd's algorithm — the iterative-algorithm shape (broadcast model →
assign pass → partial-sum reduce → driver-side model update) that a
real IVF/SemDeDup deployment trains its quantizer with.

Determinism contract (shared with the ANN queries, see
queries/__init__.py):
- init: centroid c = the embedding of vec_id = c (first K vectors);
- assignment: argmin of the scaled-integer squared distance
  sum_d round((x_d - w_d)² * 1e9), ties to the LOWEST cell id —
  order-independent BIGINT sums, so Spark and DuckDB agree exactly;
- update: per-dim scaled-int sums s_d = Σ round(x_d * 1e9) and the
  member count n; new w_d = CAST(s_d AS DOUBLE) / n / 1e9 — the same
  two IEEE divisions in the same order on both engines;
- ITERS fixed Lloyd iterations, unrolled as CTEs in the oracle;
- dedup verdict: within a final cluster, b is dropped iff some a < b
  in the same cluster has cos_micro(a, b) ≥ TAU_MICRO (the same
  first-wins, non-greedy rule as the reference's signature dedup,
  crawler.go:1241-1255, and this repo's near-dup queries).

Physical plan (the 1e10-vector story): each Lloyd iteration is ONE
mapInPandas pass over the vectors (centroid matrix broadcast in the
closure — K×64 doubles) emitting per-PARTITION partial sums
(cell, dim, s_part, n_part), then a groupBy(cell, dim) over ≤
partitions × K × 64 tiny rows; the model update is a K×64 driver
collect — legitimately driver-sized, like the IVF probe lists. No
per-(vector, centroid) shuffle ever materializes. The final per-cluster
pair scan is the same bucket-bounded applyInPandas shape as
`embedding_cosine_near_dups` — and shares its honest scale limit: K
here is a module constant the unrolled SQL oracle interpolates, so it
does NOT grow with the corpus, and each of the K clusters lands in ONE
task whose memory and O(g^2) pair work grow with corpus/K. The 1e10
path (SemDeDup used ~100k clusters for LAION) needs K scaled with the
data and the greedy in-cluster scan replaced by a sub-bucketed pass —
a deliberate non-goal for the oracle-gated query, which pins the
2-iteration Lloyd's algebra, not the deployment geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.queries import load, memo_result, register
from gocrawler_spark.queries.dedup_q import _round_half_away

KM_K = 8  # clusters
KM_ITERS = 2  # Lloyd iterations (assign→update), + one final assign
TAU_MICRO = 850_000  # SemDeDup cosine threshold (0.85)


def _unrolled_kmeans_sql() -> str:
    """WITH-clause body: x (unnested vectors), a{ITERS+1} (final
    assignment) — Lloyd iterations unrolled, one d{t}/a{t}/c{t} trio
    per round."""
    parts = [
        """
x AS (
  SELECT e.vec_id, u.i - 1 AS dim, CAST(u.x AS DOUBLE) AS x
  FROM embeddings e,
       LATERAL (SELECT unnest(e.embedding) AS x,
                       generate_subscripts(e.embedding, 1) AS i) u
),
c0 AS (
  SELECT vec_id AS cell, dim, x AS w FROM x WHERE vec_id < %(K)d
)"""
        % {"K": KM_K}
    ]
    for t in range(1, KM_ITERS + 2):
        parts.append(
            f"""
d{t} AS (
  SELECT x.vec_id, c.cell,
         sum(CAST(round((x.x - c.w) * (x.x - c.w) * 1e9) AS BIGINT)) AS dist_s
  FROM x JOIN c{t - 1} c ON c.dim = x.dim
  GROUP BY x.vec_id, c.cell
),
a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist_s ASC, cell ASC) AS r
    FROM d{t}
  ) WHERE r = 1
)"""
        )
        if t <= KM_ITERS:
            parts.append(
                f"""
c{t} AS (
  SELECT a.cell, x.dim,
         CAST(sum(CAST(round(x.x * 1e9) AS BIGINT)) AS DOUBLE)
           / count(*) / 1e9 AS w
  FROM x JOIN a{t} a ON a.vec_id = x.vec_id
  GROUP BY a.cell, x.dim
)"""
            )
    return ",".join(parts)


_FINAL = f"a{KM_ITERS + 1}"

_KMEANS_SEMDEDUP_SQL = f"""
WITH {_unrolled_kmeans_sql()},
norms AS (
  SELECT vec_id, sum(CAST(round(x * x * 1e12) AS BIGINT)) AS nrm_s
  FROM x GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM {_FINAL} a JOIN {_FINAL} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
),
dots AS (
  SELECT p.va, p.vb,
         sum(CAST(round(xa.x * xb.x * 1e12) AS BIGINT)) AS dot_s
  FROM pairs p
  JOIN x xa ON xa.vec_id = p.va
  JOIN x xb ON xb.vec_id = p.vb AND xb.dim = xa.dim
  GROUP BY p.va, p.vb
),
dropped AS (
  SELECT DISTINCT d.vb AS vec_id
  FROM dots d
  JOIN norms na ON na.vec_id = d.va
  JOIN norms nb ON nb.vec_id = d.vb
  WHERE CAST(round(d.dot_s / sqrt(CAST(na.nrm_s AS DOUBLE) * nb.nrm_s) * 1e6)
             AS BIGINT) >= {TAU_MICRO}
)
SELECT a.vec_id, a.cell,
       CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM {_FINAL} a LEFT JOIN dropped dr ON dr.vec_id = a.vec_id
ORDER BY a.vec_id
"""


@register("kmeans_semdedup", _KMEANS_SEMDEDUP_SQL)
@memo_result
def kmeans_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: fit K={KM_K} centroids with
    {KM_ITERS} Lloyd iterations, assign every vector to its final
    cluster, then drop any vector whose cosine similarity to a
    lower-id vector IN THE SAME CLUSTER is ≥ 0.85. Output one row per
    vector: (vec_id, cell, keep)."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- init: first K vectors are the seeds (tiny, driver-sized) ---
    seed_rows = (
        emb.filter(F.col("vec_id") < KM_K).orderBy("vec_id").collect()
    )
    cells = [int(r["vec_id"]) for r in seed_rows]
    C = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)

    def dist_scaled(X, C):
        # (n, K') scaled-int squared distances, identical rounding to
        # the oracle's per-dim round((x-w)²·1e9) BIGINT sums
        return np.stack(
            [
                _round_half_away((X - C[j]) ** 2 * 1e9)
                .astype(np.int64)
                .sum(axis=1)
                for j in range(C.shape[0])
            ],
            axis=1,
        )

    def make_assign(cells, C):
        cells_arr = np.array(cells, dtype=np.int64)  # sorted ascending

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                d = dist_scaled(X, C)
                # argmin ties to the lowest index; cells_arr is sorted,
                # so lowest index == lowest cell id (oracle tie rule)
                best = cells_arr[np.argmin(d, axis=1)]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                        "cell": best.astype(np.int32),
                    }
                )

        return assign

    def make_partials(cells, C):
        assign = make_assign(cells, C)

        def partials(batches):
            # one pass: assign AND emit per-batch partial sums — at
            # 1e10 vectors this is the whole iteration's data motion:
            # K×64 rows per task into a K×64-group reduce
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                Xs = _round_half_away(X * 1e9).astype(np.int64)
                (adf,) = list(assign(iter([pdf])))
                cell = adf["cell"].to_numpy()
                out = []
                for c in np.unique(cell):
                    m = cell == c
                    s = Xs[m].sum(axis=0)
                    out.append(
                        pd.DataFrame(
                            {
                                "cell": int(c),
                                "dim": np.arange(X.shape[1], dtype=np.int32),
                                "s_part": s,
                                "n_part": int(m.sum()),
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        return partials

    # --- Lloyd iterations: partial-sum reduce + driver model update ---
    for _ in range(KM_ITERS):
        sums = (
            emb.mapInPandas(
                make_partials(cells, C),
                "cell int, dim int, s_part long, n_part long",
            )
            .groupBy("cell", "dim")
            .agg(
                F.sum("s_part").alias("s"),
                F.sum("n_part").alias("n"),
            )
            .collect()  # ≤ K×64 rows — the model, not the data
        )
        by_cell: dict[int, np.ndarray] = {}
        n_by_cell: dict[int, int] = {}
        for r in sums:
            v = by_cell.setdefault(int(r["cell"]), np.zeros(C.shape[1]))
            v[int(r["dim"])] = float(r["s"])
            n_by_cell[int(r["cell"])] = int(r["n"])
        cells = sorted(by_cell)  # empty clusters drop out (oracle: no c{t} rows)
        C = np.stack(
            [by_cell[c] / n_by_cell[c] / 1e9 for c in cells], axis=0
        )

    final = emb.mapInPandas(make_assign(cells, C), "vec_id long, cell int")

    # --- SemDeDup: first-wins near-dup scan inside each cluster ---
    with_vec = final.join(emb, "vec_id")

    def dedup_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        nrm = _round_half_away(X * X * 1e12).astype(np.int64).sum(axis=1)
        keep = np.ones(len(pdf), dtype=np.int32)
        for b in range(1, len(pdf)):
            dot = (
                _round_half_away(X[:b] * X[b] * 1e12)
                .astype(np.int64)
                .sum(axis=1)
            )
            cos = _round_half_away(
                dot / np.sqrt(nrm[:b].astype(np.float64) * nrm[b]) * 1e6
            ).astype(np.int64)
            if (cos >= TAU_MICRO).any():
                keep[b] = 0
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                "cell": pdf["cell"].to_numpy(dtype=np.int32),
                "keep": keep,
            }
        )

    return (
        with_vec.groupBy("cell")
        .applyInPandas(dedup_in_cluster, "vec_id long, cell int, keep int")
        .orderBy("vec_id")
    )
