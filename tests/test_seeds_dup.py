"""Duplicate bootstrap seeds: engine/oracle parity AND pinned values.

The round-4 fix made duplicate `bootstrapping_links` merge through
addLink's count++ on re-sight (crawler.go:455-459) in BOTH the engine
(operators/frontier.py bootstrap_frontier) and the Python oracle
(oracle/pyoracle.py bootstrap) — but symmetrically, so a matched pair
of bugs (e.g. both emitting one row per list entry) would pass a
parity-only suite. These tests therefore pin the EXPECTED values
directly (one pool row per distinct URL, count = multiplicity,
seq = first-sight order) in addition to running the full engine-vs-
oracle e2e on a dup-seed profile. Reverting either side's merge fails
the corresponding direct assertion (mutation-checked during round 5).
"""

import os

from gocrawler_spark.config import test_profile as _tp
from gocrawler_spark.operators import frontier as FR
from gocrawler_spark.oracle.pyoracle import ReferenceOracle
from gocrawler_spark.plans.crawl import CrawlEngine
from gocrawler_spark.sources import synthetic_web as SW

# A appears twice, B three times, interleaved: first-sight order is
# A then B, multiplicities 2 and 3
DUP_SEEDS = (
    "https://seed.example/start",
    "https://alpha.example/topic-dup",
    "https://seed.example/start",
    "https://alpha.example/topic-dup",
    "https://alpha.example/topic-dup",
)
EXPECT = {
    "https://seed.example/start": (2, 0),  # (count, seq)
    "https://alpha.example/topic-dup": (3, 1),
}

N_STEPS = int(os.environ.get("E2E_STEPS", "6"))


def test_engine_bootstrap_merges_duplicate_seeds(spark):
    cfg = _tp(bootstrapping_links=DUP_SEEDS)
    rows = FR.bootstrap_frontier(spark, cfg).collect()
    got = {r["url"]: (r["count"], r["seq"]) for r in rows}
    assert got == EXPECT
    assert all(r["status"] == 4 for r in rows)


def test_oracle_bootstrap_merges_duplicate_seeds():
    # BOTH oracles: ReferenceOracle bootstraps through add_link (merge
    # is inherent); WaveOracle overrides bootstrap with its own merge
    # (the round-4 fix, oracle/pyoracle.py:398-408) — pin each
    # independently so a regression in the override cannot hide behind
    # the base class
    from gocrawler_spark.oracle.pyoracle import WaveOracle

    cfg = _tp(bootstrapping_links=DUP_SEEDS)
    want = [
        (u, c, 4)
        for u, (c, _) in sorted(EXPECT.items(), key=lambda kv: kv[1][1])
    ]
    for cls in (ReferenceOracle, WaveOracle):
        o = cls(cfg, SW.fetch_page)
        o.bootstrap()
        assert [(e.url, e.count, e.status) for e in o.pool] == want, cls


def test_dup_seed_profile_e2e_exact(spark):
    """Full wave=1 run on the dup-seed profile: crawl order, frontier
    (count/status/seq), and seen set must match the oracle — the
    doubled/tripled seed counts flow into the priority formula
    count^2/(fetches+1), so any divergence in the merged multiplicity
    changes selection order downstream."""
    cfg = _tp(bootstrapping_links=DUP_SEEDS)
    want = ReferenceOracle(cfg, SW.fetch_page).run(max_iters=N_STEPS)
    st = CrawlEngine(spark, _tp(bootstrapping_links=DUP_SEEDS, wave_size=1)).run(
        max_steps=N_STEPS
    )
    got_order = [
        r["url"] for r in st.crawl_log.orderBy("wave", "sel_rank").collect()
    ]
    assert got_order == want.crawl_order
    got_frontier = {
        r["url"]: (r["domain"], r["count"], r["status"], r["seq"])
        for r in st.frontier.collect()
    }
    want_frontier = {
        e.url: (e.domain, e.count, e.status, i)
        for i, e in enumerate(want.pool)
    }
    assert got_frontier == want_frontier
    assert {r["url"] for r in st.pages.select("url").collect()} == want.seen_urls
