"""Pointer-doubling redirect resolution vs a brute-force walker."""

import random

from gocrawler_spark.operators.graph import resolve_chains


def _brute(succ: dict[int, int], max_hops: int):
    """Walk each start hop-by-hop: (final_id, hops, resolved)."""
    out = {}
    for start in succ:
        cur, hops = succ[start], 1
        while cur in succ and hops < max_hops:
            cur, hops = succ[cur], hops + 1
        resolved = cur not in succ
        out[start] = (cur if resolved else -1, hops, 1 if resolved else 0)
    return out


def _run(spark, succ, max_hops):
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in succ.items()], "src long, dst long"
    )
    got = {
        r["doc_id"]: (r["final_id"], r["hops"], r["resolved"])
        for r in resolve_chains(edges, max_hops).collect()
    }
    assert got == _brute(succ, max_hops)


def test_chain_cycle_deep(spark):
    # 40-deep chain into terminal 40, a 2-cycle, a self-loop, a fan-in
    succ = {i: i + 1 for i in range(40)}
    succ[50], succ[51] = 51, 50
    succ[60] = 60
    succ[70], succ[71] = 99, 99
    _run(spark, succ, 32)


def test_exact_hop_saturation(spark):
    # chain of exactly max_hops resolves at the cap; one longer does not
    succ = {i: i + 1 for i in range(8)}  # 0 needs 8 hops to reach 8
    _run(spark, succ, 8)
    _run(spark, succ, 4)


def test_random_functional_graph(spark):
    rng = random.Random(7)
    succ = {s: rng.randrange(120) for s in rng.sample(range(120), 80)}
    _run(spark, succ, 32)


def test_opic_cash_conservation_and_hand_computed(spark):
    """Total cash is conserved to the micro-unit across waves, and a
    hand-computable 3-node cycle gives the exact expected split."""
    from pyspark.sql import functions as F

    from gocrawler_spark.operators.graph import opic_waves

    # 3-cycle with uneven out-degrees: node 0 -> 1,2 (deg 2); 1 -> 2; 2 -> 0
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame(
        [(0, 1, 1, 2), (0, 2, 2, 2), (1, 2, 1, 1), (2, 0, 1, 1)],
        "src long, dst long, slot int, n_slots int",
    )
    out = {r["node"]: r for r in opic_waves(nodes, edges, waves=2, cash0_micro=9).collect()}
    # wave1: 0 gives 4 to 1, 5 to 2; 1 gives 9 to 2; 2 gives 9 to 0
    #   cash: 0->9, 1->4, 2->14 ; hist: 9 each
    # wave2: 0 gives 4,5; 1 gives 4; 2 gives 14
    #   cash: 0->14, 1->4, 2->9 ; hist: 0:18, 1:13, 2:23
    assert (out[0]["history_micro"], out[0]["cash_micro"]) == (18, 14)
    assert (out[1]["history_micro"], out[1]["cash_micro"]) == (13, 4)
    assert (out[2]["history_micro"], out[2]["cash_micro"]) == (23, 9)
    assert sum(r["cash_micro"] for r in out.values()) == 27  # conserved


def test_opic_sink_cash_redistributed_and_conserved(spark):
    """A sink node (no out-edges) spends into the virtual page, whose
    cash is redistributed uniformly with the division remainder going
    to the lowest node id — total cash stays conserved on graphs the
    all-nodes-have-outlinks queries never exercise."""
    from gocrawler_spark.operators.graph import opic_waves

    # 0 -> 1, 1 -> 2, 2 is a sink; 3 nodes, cash0 = 10 each
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame(
        [(0, 1, 1, 1), (1, 2, 1, 1)],
        "src long, dst long, slot int, n_slots int",
    )
    out = {
        r["node"]: r
        for r in opic_waves(nodes, edges, waves=2, cash0_micro=10).collect()
    }
    # wave1: 0 sends 10 to 1; 1 sends 10 to 2; sink 2 banks 10 into
    # the virtual page -> base 10 DIV 3 = 3 each, remainder 1 to node 0
    #   cash: 0 -> 0+3+1=4, 1 -> 10+3=13, 2 -> 10+3=13 ; total 30
    # wave2: 0 sends 4; 1 sends 13; sink 2 banks 13 -> 4 each, rem 1 to 0
    #   cash: 0 -> 0+4+1=5, 1 -> 4+4=8, 2 -> 13+4=17 ; total 30
    assert (out[0]["cash_micro"], out[1]["cash_micro"], out[2]["cash_micro"]) == (5, 8, 17)
    assert sum(r["cash_micro"] for r in out.values()) == 30
    # history banks every wave's pre-distribution cash, sinks included
    assert out[2]["history_micro"] == 10 + 13
