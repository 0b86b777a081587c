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
