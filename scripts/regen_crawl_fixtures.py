"""Regenerate the crawl-loop driver-gate fixtures from the Python
reference-semantics oracles (no Spark involved — the fixtures must be
produced by the INDEPENDENT implementation, never by the engine they
gate).

- fixtures/crawl_frontier_w5.csv  <- ReferenceOracle, 5 waves
- fixtures/crawl_polite_w8.csv    <- PoliteOracle (robots gate), 8
  waves (8 so the synthetic robots rules actually refuse URLs inside
  the window — /story-* is disallowed for two of the crawled hosts)

Usage: python scripts/regen_crawl_fixtures.py
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gocrawler_spark.config import test_profile
from gocrawler_spark.oracle.pyoracle import PoliteOracle, ReferenceOracle
from gocrawler_spark.sources import synthetic_web as SW

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gocrawler_spark",
    "fixtures",
)


def write_pool(pool, path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "domain", "count", "status", "seq"])
        for i, e in enumerate(pool):
            w.writerow([e.url, e.domain, e.count, e.status, i])
    print(f"wrote {path} ({len(pool)} rows)")


if __name__ == "__main__":
    cfg = test_profile(wave_size=1)
    res = ReferenceOracle(cfg, SW.fetch_page).run(max_iters=5)
    write_pool(res.pool, os.path.join(FIXTURES, "crawl_frontier_w5.csv"))
    res = PoliteOracle(cfg, SW.fetch_page).run(max_iters=8)
    write_pool(res.pool, os.path.join(FIXTURES, "crawl_polite_w8.csv"))
