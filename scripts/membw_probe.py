"""DRAM-bandwidth probe: how much memory bandwidth does this box give
1, 2, 4, ... concurrent cores?

Why this exists: the north-rule scaling criterion (N -> 4N executors,
efficiency >= 0.8) is evidenced in-sandbox by running the same Spark
job at local[N] and local[4N] **on one box**. The frontier merge job is
scan/join-bound — per row it does a few compares and copies, so its
per-core cost is dominated by DRAM traffic, not ALU work. On a real
cluster, 4x the executors bring 4x the aggregate memory channels; on a
single box all cores share one memory controller, so once K cores
saturate the socket's bandwidth, adding cores cannot speed up a
bandwidth-bound job no matter how perfectly it parallelizes. This
probe measures that ceiling directly: aggregate copy bandwidth at
1/4/8/16/32 concurrent pinned processes. The ratio
bw(4N)/bw(N) is the physics-imposed efficiency ceiling for a
bandwidth-bound job between those two levels ON THIS BOX — report it
next to the measured Spark efficiency so the number is read against
the right limit.

Each worker is pinned to its own core (sched_setaffinity) and copies a
256 MiB float64 array src->dst repeatedly for ~1.5 s; bandwidth is
counted as 2 bytes moved per byte copied (read + write; nontemporal
stores and RFO elision vary by CPU — the convention is stated, and
only RATIOS between levels matter here, which the convention cancels
out of).

Usage:
    python scripts/membw_probe.py [levels...]   # default: 1 4 8 16 32
Prints one JSON line:
    {"levels_gbps": {"1": gbps, ...},
     "efficiency_ceiling_4x": {"4->16": r, "8->32": r}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ARR_BYTES = 256 * 1024 * 1024
SECONDS = 1.5


def _worker(core: int, barrier, out_q) -> None:
    import numpy as np

    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass  # no isolation possible; still measure
    n = ARR_BYTES // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty(n, dtype=np.float64)
    # touch both arrays so page faults don't count as bandwidth
    dst[:] = src
    # all workers start copying at the same instant: without the
    # barrier, spawn skew (each child imports numpy) de-overlaps the
    # measurement windows and the aggregate sum OVERSTATES concurrent
    # bandwidth (first measured: a physically impossible 457 GB/s at
    # 32 cores)
    barrier.wait()
    reps = 0
    t0 = time.time()
    while time.time() - t0 < SECONDS:
        dst[:] = src
        reps += 1
    dt = time.time() - t0
    out_q.put((reps * ARR_BYTES * 2 / dt, dt))  # read + write


def measure(ncores: int) -> float:
    """Aggregate copy bandwidth (bytes/sec) with `ncores` concurrent
    pinned workers, all released from a start barrier together."""
    q = mp.Queue()
    barrier = mp.Barrier(ncores)
    procs = [
        mp.Process(target=_worker, args=(c, barrier, q))
        for c in range(ncores)
    ]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    # only the overlapped window counts; every worker ran ~SECONDS
    # from the same barrier release, so summing per-worker rates is
    # now a faithful concurrent aggregate
    return sum(v[0] for v in vals)


def run(levels=(1, 4, 8, 16, 32)) -> dict:
    out = {}
    for lv in levels:
        # best of 2: a contended hypervisor neighbor can depress one
        # sample; the max is the bandwidth the box can actually give
        out[str(lv)] = round(
            max(measure(lv) for _ in range(2)) / 1e9, 2
        )
    ceil = {}
    for lo in levels:
        hi = lo * 4
        if str(hi) in out:
            ceil[f"{lo}->{hi}"] = round(out[str(hi)] / out[str(lo)] / 4, 3)
    return {"levels_gbps": out, "efficiency_ceiling_4x": ceil}


if __name__ == "__main__":
    lvls = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 8, 16, 32)
    print(json.dumps(run(lvls)))
