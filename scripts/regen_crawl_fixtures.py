"""Regenerate the crawl-loop driver-gate fixtures from the Python
reference-semantics oracles (no Spark involved — the fixtures must be
produced by the INDEPENDENT implementation, never by the engine they
gate).

- fixtures/crawl_frontier_w5.csv  <- ReferenceOracle, 5 waves
- fixtures/crawl_polite_w8.csv    <- PoliteOracle (robots gate), 8
  waves (8 so the synthetic robots rules actually refuse URLs inside
  the window — /story-* is disallowed for two of the crawled hosts)
- fixtures/crawl_scale_w8.csv + crawl_scale_visited_w8.csv
  <- WaveOracle (epoch semantics), 8 waves at wave_size=8,
  per_host_budget=2 — the SCALE-MODE gate (SURVEY.md §7.3): final
  frontier incl. counts/seqs plus the per-epoch visited relation.
- fixtures/crawl_scale_corpus_w8.csv <- the same WaveOracle run's
  accumulated corpus frequencies — the crawl-side input to the
  GOLDEN-RUN gate (the reference README's "Corpus frequencies w/o
  Eng." demo artifact); the DuckDB oracle restates the baseline
  merge + background subtraction from this CSV and the .num files.

Usage: python scripts/regen_crawl_fixtures.py
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gocrawler_spark.config import test_profile
from gocrawler_spark.oracle.pyoracle import (
    PoliteOracle,
    ReferenceOracle,
    WaveOracle,
)
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

    scfg = test_profile(wave_size=8, per_host_budget=2)
    worc = WaveOracle(scfg, SW.fetch_page)
    worc.run(max_iters=8)
    write_pool(worc.pool, os.path.join(FIXTURES, "crawl_scale_w8.csv"))
    vpath = os.path.join(FIXTURES, "crawl_scale_visited_w8.csv")
    with open(vpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wave", "url", "status_after"])
        for wave, url, st in worc.visited:
            w.writerow([wave, url, st])
    print(f"wrote {vpath} ({len(worc.visited)} rows)")
    cpath = os.path.join(FIXTURES, "crawl_scale_corpus_w8.csv")
    with open(cpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["token", "count"])
        for tok in sorted(worc.res.corpus_freqs):
            w.writerow([tok, worc.res.corpus_freqs[tok]])
    print(f"wrote {cpath} ({len(worc.res.corpus_freqs)} rows)")

    # RECRAWL gate: a FRESH 8-wave scale run -> retire the 2 stalest
    # pages -> one more wave (the retired URLs must be re-fetched
    # exactly once, with counts/seqs preserved and statuses back to 2).
    # The fixture carries per-URL OK-fetch totals so the gate pins the
    # "exactly once more" property, not just final frontier statuses.
    worc2 = WaveOracle(scfg, SW.fetch_page)
    worc2.run(max_iters=8)
    retired = worc2.retire_stalest(2)
    assert worc2.step_wave(), "recrawl wave must select something"
    ok_fetches: dict[str, int] = {}
    for _, url, st in worc2.visited:
        if st == 2:
            ok_fetches[url] = ok_fetches.get(url, 0) + 1
    rpath = os.path.join(FIXTURES, "crawl_recrawl_w9.csv")
    with open(rpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "domain", "count", "status", "seq", "ok_fetches"])
        for i, e in enumerate(worc2.pool):
            w.writerow(
                [e.url, e.domain, e.count, e.status, i,
                 ok_fetches.get(e.url, 0)]
            )
    print(
        f"wrote {rpath} ({len(worc2.pool)} rows; retired={retired}; "
        f"refetched={[u for u in retired if ok_fetches.get(u, 0) > 1]})"
    )
