r"""Redirect-chain resolution under the driver's oracle gate.

The reference never sees a redirect hop: Go's ``http.Get`` silently
chases up to 10 redirects inside the fetch call
(``/root/reference/crawler.go:207-216``), so its URL-seen set is keyed
by the *requested* URL while the body belongs to the *final* one — an
alias leak this engine must not reproduce at 1e10 URLs. Here the
redirect map is a first-class table and chains are resolved in
``log2(max_hops)`` pointer-doubling joins (operators/graph.py) before
frontier insertion, so the seen-set and dedup keys are canonical final
targets, and redirect *loops* (the classic crawler trap) surface as
``resolved = 0`` rows instead of hanging a fetch slot.

The synthetic redirect map is a pure integer function of ``doc_id``
(stated identically in both engines), shaped to exercise every path:

- ``doc_id < 40``       -> ``doc_id + 1``: a 40-deep chain, so starts
  0..7 sit deeper than the 32-hop budget (unresolved), 8..39 resolve
  with exact hop counts 32..1,
- ``doc_id in (50,51)`` -> each other: a 2-cycle (redirect loop),
- ``doc_id >= 60, doc_id % 10 < 3`` -> ``(doc_id*131 + 7) % n``:
  pseudo-random sprinkle with organic chains (a hash target may itself
  redirect, including into the deep chain or the loop).

The oracle is a genuinely independent formulation: a recursive CTE
that walks hop-by-hop (hops < 32), keeps each start's deepest row,
and flags terminality — versus the engine's doubling composition.

Scale shape: 5 self-joins on int64 keys + one distinct-source
anti-probe; 24 bytes/node of state per round, no driver data motion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.operators.graph import opic_waves, resolve_chains
from gocrawler_spark.queries import load, register

MAX_HOPS = 32

# the redirect map as one SQL expression over documents (both engines
# state the same integer function; n = count(documents) keeps the hash
# rule's range in-table at every SF)
_REDIRECTS_CTE = """
r AS (
  SELECT doc_id AS src,
         CASE WHEN doc_id < 40 THEN doc_id + 1
              WHEN doc_id = 50 THEN 51
              WHEN doc_id = 51 THEN 50
              ELSE (doc_id * 131 + 7) % (SELECT count(*) FROM documents)
         END AS dst
  FROM documents
  WHERE doc_id < 40 OR doc_id IN (50, 51)
     OR (doc_id >= 60 AND doc_id % 10 < 3)
)"""


def redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same redirect map, engine-side (pure doc_id arithmetic)."""
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    d = F.col("doc_id")
    return (
        docs.filter(
            (d < 40)
            | d.isin(50, 51)
            | ((d >= 60) & (d % 10 < 3))
        )
        .select(
            d.alias("src"),
            F.when(d < 40, d + 1)
            .when(d == 50, F.lit(51))
            .when(d == 51, F.lit(50))
            .otherwise((d * 131 + 7) % F.lit(n))
            .cast("long")
            .alias("dst"),
        )
    )


@register(
    "redirect_resolution",
    f"""
WITH RECURSIVE {_REDIRECTS_CTE},
walk(start, cur, hops) AS (
  SELECT src, dst, 1 FROM r
  UNION ALL
  SELECT w.start, r2.dst, w.hops + 1
  FROM walk w JOIN r r2 ON r2.src = w.cur
  WHERE w.hops < {MAX_HOPS}
),
fin AS (
  SELECT start, cur, hops,
         row_number() OVER (PARTITION BY start ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT f.start AS doc_id,
       CAST(CASE WHEN t.src IS NULL THEN f.cur ELSE -1 END AS BIGINT)
         AS final_id,
       CAST(f.hops AS BIGINT) AS hops,
       CAST(CASE WHEN t.src IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS resolved
FROM fin f LEFT JOIN (SELECT DISTINCT src FROM r) t ON t.src = f.cur
WHERE f.rn = 1
ORDER BY doc_id
""",
)
def redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every redirect chain to its canonical terminal (or flag
    the loop) in log2(32) = 5 pointer-doubling joins — the
    pre-frontier canonicalization pass a redirect-aware crawler runs
    so the seen-set keys on final targets. Emits per start URL the
    terminal node, the exact hop count min(t, 32), and a resolved
    flag; deep chains (> 32 hops) and redirect loops come out
    resolved = 0 / final_id = -1."""
    return resolve_chains(redirect_edges(spark, sf_dir), MAX_HOPS).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# OPIC frontier prioritization (Abiteboul et al., WWW 2003)
# ---------------------------------------------------------------------------

OPIC_WAVES = 3
OPIC_CASH0 = 1_000_000

# the link graph as pure doc_id arithmetic (out-degree exactly 2),
# stated identically in both engines; n = count(documents) keeps the
# targets in-table at every SF. Self-loops are allowed and handled
# (a page may cite itself; OPIC just hands the cash back).
_OPIC_EDGES_CTE = """
nn AS (SELECT count(*) AS c FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT c FROM nn) AS dst,
         1 AS slot, 2 AS n_slots FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 5) % (SELECT c FROM nn), 2, 2 FROM documents
)"""


def _opic_step_sql(prev: str, out: str) -> str:
    """One OPIC wave as SQL: distribute each node's cash over its two
    edge slots (slot 1 takes cash // 2, the last slot absorbs the
    remainder — conservation to the unit), re-collect per dst, and
    mirror the engine's virtual-page redistribution (sink cash BY
    CONSERVATION = total − delivered, spread uniformly with the
    remainder to the lowest node) — zero for this query's
    out-degree-2 graph, but stated so oracle and engine cannot
    diverge on a graph whose ids ever stop being 0..n-1."""
    return f"""
d_{out} AS (
  SELECT e.dst AS node,
         SUM(CASE WHEN e.slot < e.n_slots THEN c.cash // e.n_slots
                  ELSE c.cash - (e.n_slots - 1) * (c.cash // e.n_slots)
             END) AS recv
  FROM edges e JOIN {prev} c ON c.node = e.src GROUP BY e.dst),
s_{out} AS (
  SELECT CAST((SELECT c FROM nn) * {OPIC_CASH0}
              - COALESCE((SELECT SUM(recv) FROM d_{out}), 0) AS BIGINT)
         AS sink),
{out} AS (
  SELECT nodes.node,
         CAST(COALESCE(d_{out}.recv, 0)
              + s.sink // (SELECT c FROM nn)
              + CASE WHEN nodes.node = (SELECT min(node) FROM nodes)
                     THEN s.sink
                          - (SELECT c FROM nn)
                            * (s.sink // (SELECT c FROM nn))
                     ELSE 0 END AS BIGINT) AS cash
  FROM nodes LEFT JOIN d_{out} ON nodes.node = d_{out}.node, s_{out} s)"""


@register(
    "opic_priorities",
    f"""
    WITH {_OPIC_EDGES_CTE},
    c0 AS (SELECT node, CAST({OPIC_CASH0} AS BIGINT) AS cash FROM nodes),
    {_opic_step_sql('c0', 'c1')},
    {_opic_step_sql('c1', 'c2')},
    {_opic_step_sql('c2', 'c3')}
    SELECT c0.node,
           CAST(c0.cash + c1.cash + c2.cash AS BIGINT) AS history_micro,
           CAST(c3.cash AS BIGINT) AS cash_micro,
           CAST(c0.cash + c1.cash + c2.cash + c3.cash AS BIGINT)
             AS importance_micro
    FROM c0 JOIN c1 USING (node) JOIN c2 USING (node) JOIN c3 USING (node)
    ORDER BY importance_micro DESC, node ASC LIMIT 20
    """,
)
def opic_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC crawl-priority scores after {OPIC_WAVES} cash-distribution
    waves over the arithmetic link graph; top-20 pages the crawler
    would fetch next. Integer-exact cash conservation, per-wave cost =
    one int64-keyed join + one groupBy (operators/graph.opic_waves).

    Oracle: the same {OPIC_WAVES} waves unrolled as DuckDB CTE steps —
    an independent relational restatement of the split/absorb/collect
    arithmetic."""
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    d = F.col("doc_id")
    nodes = docs.select(d.alias("node"))
    e1 = docs.select(
        d.alias("src"),
        ((d * 7 + 1) % F.lit(n)).cast("long").alias("dst"),
        F.lit(1).alias("slot"),
        F.lit(2).alias("n_slots"),
    )
    e2 = docs.select(
        d.alias("src"),
        ((d * 13 + 5) % F.lit(n)).cast("long").alias("dst"),
        F.lit(2).alias("slot"),
        F.lit(2).alias("n_slots"),
    )
    scored = opic_waves(nodes, e1.unionByName(e2), waves=OPIC_WAVES, cash0_micro=OPIC_CASH0)
    return scored.orderBy(F.desc("importance_micro"), F.asc("node")).limit(20)
