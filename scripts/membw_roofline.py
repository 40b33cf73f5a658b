#!/usr/bin/env python3
"""Pinned memory-bandwidth roofline for the scaling report.

The 2→8 scaling pair in BENCH/BASELINE.md is bounded by how much
MORE aggregate memory bandwidth 8 pinned cores get than 2 on this
shared one-socket host — a Spark stage that streams its working set
cannot scale better than the bandwidth ratio.  This script measures
that ratio directly: N processes, each pinned to its own core, each
streaming read-modify-write (x += 1 over a float64 array far larger
than L3) for a fixed wall window; aggregate bytes/s per level.

The bandwidth-bound efficiency CEILING for an N→4N pair is then
    eff_max(N→4N) = BW(4N) / (4 · BW(N))
which the report places next to the measured Spark efficiencies.

Usage: python scripts/membw_roofline.py [reps]
Prints one JSON line: {"levels": {"1": GB/s, ...}, "ceilings": {...}}
Each level's figure is the MAX over reps (interference-free profile,
same convention as bench.py --scaling minima).
"""

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

LEVELS = [1, 2, 4, 8, 16]
ARRAY_MB = 256          # >> L3, per process
WINDOW_SEC = 3.0
RW_BYTES_PER_ELEM = 16  # read 8 + write 8 per float64


def _worker(core: int, window: float, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    a = np.ones(ARRAY_MB * 1024 * 1024 // 8, dtype=np.float64)
    a += 1.0  # touch every page before timing
    passes = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < window:
        a += 1.0
        passes += 1
    dt = time.perf_counter() - t0
    out_q.put(passes * a.nbytes * (RW_BYTES_PER_ELEM / 8) / dt)


def measure(n_threads: int) -> float:
    """Aggregate streaming bandwidth (bytes/s) over n pinned procs."""
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(core, WINDOW_SEC, q))
        for core in range(n_threads)
    ]
    for p in procs:
        p.start()
    vals = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best: dict[int, float] = {lv: 0.0 for lv in LEVELS}
    for _ in range(reps):
        for lv in LEVELS:
            best[lv] = max(best[lv], measure(lv))
    gbs = {str(lv): round(b / 1e9, 2) for lv, b in best.items()}
    ceilings = {}
    for lo, hi in ((1, 4), (2, 8), (4, 16)):
        ceilings[f"{lo}->{hi}"] = round(best[hi] / (4 * best[lo]), 3)
    print(json.dumps({"levels_gb_per_s": gbs, "eff_ceilings": ceilings}))
    return 0


if __name__ == "__main__":
    main()
