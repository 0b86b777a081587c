r"""Functional-graph pointer doubling — redirect-chain resolution.

The reference's fetch path follows HTTP redirects implicitly (Go's
``http.Get`` chases up to 10 redirects inside the client call,
``/root/reference/crawler.go:207-216`` — the crawler only ever sees
the final body). A distributed crawler cannot hide that inside a
blocking per-URL call: at frontier scale the redirect map is itself a
table (src_url -> dst_url, one successor per src), and resolving every
chain to its canonical terminal BEFORE frontier insertion is what
keeps the seen-set keyed by final targets instead of by every hop
alias.

This operator resolves all chains of a *functional graph* (each node
has at most one successor) with **pointer doubling**: the jump table
``j_k(node) = (node after min(2^k, t(node)) steps, that step count)``
is composed with itself each round, so ``max_hops`` is covered in
``ceil(log2(max_hops))`` self-joins instead of ``max_hops`` sequential
ones. Cycles (redirect loops) and chains longer than ``max_hops``
never reach a terminal and come out flagged ``resolved = 0``.

Scale shape: each round is ONE equi-join of the jump table with
itself on the jump target plus a projection — state is 24 bytes/node,
materialized per round (bounded lineage, same discipline as the
PageRank iterations in queries/rel_q.py). At 1e10 redirect edges
that is 5 co-partitioned shuffles for a 32-hop budget; the sequential
alternative is 32. Terminality is ONE final left anti-style join
against the distinct source set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chains(edges: DataFrame, max_hops: int = 32) -> DataFrame:
    """Resolve every chain of a functional graph.

    ``edges`` must have columns ``src`` / ``dst`` (one row per
    redirecting node; at most one successor per ``src``). Returns one
    row per ``src``:

    - ``doc_id``   — the start node,
    - ``final_id`` — the terminal node (a node that is not itself a
      ``src``) if one is reached within ``max_hops`` steps, else -1,
    - ``hops``     — exact steps walked: ``min(t(node), max_hops)``
      where ``t`` is the distance to the terminal (cycles: ``t = ∞``),
    - ``resolved`` — 1 iff a terminal was reached within the budget.

    ``max_hops`` is rounded up to the next power of two by the
    doubling rounds, so pass a power of two for exact-cap semantics
    (the default 32 mirrors a 3x margin over Go's 10-redirect limit).
    """
    rounds = max(1, math.ceil(math.log2(max_hops)))
    jump = edges.select(
        F.col("src").alias("node"),
        F.col("dst").alias("to"),
        F.lit(1).cast("long").alias("steps"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        hop = jump.select(
            F.col("node").alias("g_node"),
            F.col("to").alias("g_to"),
            F.col("steps").alias("g_steps"),
        )
        # if `to` is terminal it has no row in the jump table: the
        # left join keeps (to, steps) fixed — saturation at t(node).
        jump = (
            jump.join(hop, jump["to"] == hop["g_node"], "left")
            .select(
                "node",
                F.coalesce("g_to", "to").alias("to"),
                (F.col("steps") + F.coalesce("g_steps", F.lit(0)))
                .cast("long")
                .alias("steps"),
            )
            .localCheckpoint(eager=True)
        )
    srcs = edges.select(F.col("src").alias("t_src")).distinct()
    return (
        jump.join(srcs, jump["to"] == srcs["t_src"], "left")
        .select(
            F.col("node").alias("doc_id"),
            F.when(F.col("t_src").isNull(), F.col("to"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("final_id"),
            F.col("steps").alias("hops"),
            F.when(F.col("t_src").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("resolved"),
        )
    )


def opic_waves(
    nodes: DataFrame,
    edges: DataFrame,
    waves: int = 3,
    cash0_micro: int = 1_000_000,
) -> DataFrame:
    """On-line Page Importance Computation (OPIC, Abiteboul et al.,
    WWW 2003) — the classic crawler frontier-prioritization algorithm:
    every page starts with equal cash; each wave it distributes ALL
    its cash across its outlinks and banks the amount in its history;
    importance = history + current cash, and the crawler fetches
    highest-importance frontier pages first. Unlike PageRank it needs
    no convergence — importance is meaningful after every wave, which
    is exactly what an online crawler wants.

    Integer-exact: cash is micro-units; an edge's share is
    ``cash DIV out_degree`` with the LAST slot absorbing the
    remainder, so total cash is conserved to the unit every wave
    (asserted in tests). ``edges`` must carry (src, dst, slot) with
    slot = 1..out_degree(src) and ``n_slots`` = out_degree(src).

    Sink pages (nodes with NO outgoing edge rows — normal in a real
    link graph) spend their cash into the paper's virtual page, which
    redistributes it uniformly: every node receives
    ``sink_cash DIV n_nodes`` and the division remainder
    (< n_nodes micro-units) goes to the lowest node id — a
    deterministic, integer-exact policy, so total cash stays conserved
    to the unit on ANY graph whose edge dsts are all in ``nodes`` (the
    standing contract — a dst outside ``nodes`` silently drops cash in
    the join back, with or without sinks). The sink amount is derived
    by conservation (total − sum of delivered shares), not by a second
    pass over the cash table.

    Scale shape per wave: one broadcast-free equi-join edges⋈cash on
    src (shuffle keyed by int64), one groupBy dst — 16 bytes/row of
    state — plus two 1-row broadcast dims for the virtual-page
    redistribution; the new cash table is localCheckpoint'ed per wave
    so lineage stays linear in ``waves`` (same discipline as
    resolve_chains). Nodes with no inlinks hold zero cash rows via the
    left join back to ``nodes``."""
    cash = nodes.select("node", F.lit(cash0_micro).cast("long").alias("cash"))
    history = nodes.select("node", F.lit(0).cast("long").alias("hist"))
    ndim = nodes.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").alias("min_node"),
    )
    for _ in range(waves):
        contrib = (
            edges.join(cash, edges["src"] == cash["node"])
            .select(
                F.col("dst"),
                F.when(
                    F.col("slot") < F.col("n_slots"),
                    F.expr("cash DIV n_slots"),
                )
                .otherwise(
                    F.col("cash") - (F.col("n_slots") - 1) * F.expr("cash DIV n_slots")
                )
                .alias("share"),
            )
        )
        recv = contrib.groupBy("dst").agg(F.sum("share").alias("recv"))
        # virtual-page cash BY CONSERVATION, not a second pass over
        # `cash`: total circulating cash is invariant at
        # n_nodes * cash0 (this very redistribution maintains it), so
        # sink cash = total - what the edges delivered. This keeps each
        # wave's plan referencing the previous cash exactly ONCE — an
        # anti-join variant would double the cash subtree per wave
        # (O(2^waves) lineage).
        sink = recv.agg(
            F.coalesce(F.sum("recv"), F.lit(0)).cast("long").alias("r_sum")
        ).crossJoin(F.broadcast(ndim)).select(
            (F.col("n_nodes") * F.lit(cash0_micro) - F.col("r_sum"))
            .cast("long")
            .alias("sink_cash")
        )
        history = (
            history.join(cash, "node")
            .select("node", (F.col("hist") + F.col("cash")).alias("hist"))
        )
        cash = (
            nodes.join(recv, nodes["node"] == recv["dst"], "left")
            .crossJoin(F.broadcast(sink))
            .crossJoin(F.broadcast(ndim))
            .select(
                "node",
                (
                    F.coalesce(F.col("recv"), F.lit(0))
                    + F.expr("sink_cash DIV n_nodes")
                    + F.when(
                        F.col("node") == F.col("min_node"),
                        F.col("sink_cash") - F.col("n_nodes") * F.expr("sink_cash DIV n_nodes"),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("cash"),
            )
            # truncate lineage per wave (same discipline as
            # resolve_chains): the recv aggregate feeds BOTH the sink
            # scalar and the per-node join, and history snapshots every
            # wave's cash — without a checkpoint the recompute tree
            # still doubles per wave
            .localCheckpoint(eager=True)
        )
    return (
        history.join(cash, "node")
        .select(
            "node",
            F.col("hist").alias("history_micro"),
            F.col("cash").alias("cash_micro"),
            (F.col("hist") + F.col("cash")).alias("importance_micro"),
        )
    )
