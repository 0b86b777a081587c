"""Contract tests for bench.py's frontier throughput rep.

The rep is the north-metric measurement (BASELINE.json: frontier
schedule+dedup throughput + N->4N scaling efficiency), so its
invariants are load-bearing:

- AQE off (the round-5 default for the frontier segment) must produce
  byte-identical leg counts to AQE on — the partitioning is explicit
  (bucketed scan + fixed shuffle partitions), so adaptivity may only
  change job cadence, never results.
- With AQE off the rep must commit as a SMALL number of Spark jobs
  (<=4: eager anti-join pin, two tiny broadcast exchanges, the fused
  two-leg commit): the per-job driver scheduling latency is the
  dominant non-scaling constant in the strong-scaling fit, and the
  AQE job audit (round 4: 10 jobs/21 stages per rep) motivated the
  change. The pin stays EAGER — a lazy persist was tried and reverted
  (the offsets broadcast exchange recomputes the anti-join in its own
  job, races the ranked branch, and times out the 300 s broadcast
  wait at sweep row counts).
- An empty leg (tiny BENCH_FRONTIER_ROWS override) must report 0, not
  raise KeyError out of the fused groupBy (ADVICE r4).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.fixture()
def small_frontier(monkeypatch):
    monkeypatch.setattr(bench, "FRONTIER_ROWS", 200_000)
    monkeypatch.setattr(bench, "CAND_ROWS", 100_000)
    yield


def _run(spark, aqe: str, monkeypatch):
    monkeypatch.setenv("BENCH_FRONTIER_AQE", aqe)
    return bench.frontier_throughput(spark, warmup=False, reps=1)


def test_aqe_off_matches_aqe_on_and_collapses_jobs(
    spark, small_frontier, monkeypatch
):
    off = _run(spark, "false", monkeypatch)
    on = _run(spark, "true", monkeypatch)
    assert off["selected"] == on["selected"] > 0
    assert off["frontier_after"] == on["frontier_after"] > 0
    # the scaling lever: explicit partitioning means the rep is the
    # eager pin + two hinted broadcasts + the one fused commit
    assert off["jobs_per_rep"] <= 4
    assert on["jobs_per_rep"] >= off["jobs_per_rep"]
    # the conf is restored for the analytics suite that follows
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_empty_leg_reports_zero(spark, monkeypatch):
    # FRONTIER_ROWS=0: both legs empty -> fused groupBy yields no rows;
    # the rep must report zeros instead of KeyError (ADVICE r4 bench.py:348)
    monkeypatch.setattr(bench, "FRONTIER_ROWS", 0)
    monkeypatch.setattr(bench, "CAND_ROWS", 0)
    monkeypatch.setenv("BENCH_FRONTIER_AQE", "false")
    r = bench.frontier_throughput(spark, warmup=False, reps=1)
    assert r["selected"] == 0 and r["frontier_after"] == 0
