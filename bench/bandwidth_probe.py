"""Aggregate-memory-bandwidth ratio probe (STREAM-triad style, NumPy).

The north-rule evidence runs local[N] vs local[4N] on ONE host, so any
bandwidth-bound stage can only speed up as much as the box's aggregate
bandwidth grows from N to 4N *threads* — unlike a real N->4N *executor*
scale-up, which multiplies bandwidth by 4. This probe measures that
hardware ceiling directly: P independent processes each run a STREAM
triad (a = b + s*c) over arrays far larger than LLC and report their
bytes/s; the aggregate at P is compared across P levels. The resulting
ratios are the maximum efficiency ANY bandwidth-bound superstep can show
between the same two local[] levels on this host.

Usage: python bench/bandwidth_probe.py [reps]   (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N = 25_000_000  # 3 arrays x 8 B x 25M = 600 MB working set per process
ITERS = 5


def triad(q):
    b = np.random.default_rng(1).random(N)
    c = np.random.default_rng(2).random(N)
    a = np.empty_like(b)
    # warm
    np.multiply(c, 1.1, out=a)
    t0 = time.time()
    for _ in range(ITERS):
        np.multiply(c, 1.1, out=a)
        a += b
    dt = time.time() - t0
    q.put(ITERS * 3 * 8 * N / dt)  # triad moves 3 arrays per iter


def level(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=triad, args=(q,)) for _ in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(rates)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best: dict[int, float] = {}
    for _ in range(reps):
        for p in (1, 4, 8, 16, 32):
            gbs = level(p) / 1e9
            best[p] = max(best.get(p, 0.0), gbs)
    out = {
        "aggregate_gbs_best": {str(p): round(v, 1) for p, v in best.items()},
        "ratio_4_to_16": round(best[16] / best[4], 2),
        "ratio_8_to_32": round(best[32] / best[8], 2),
        "max_bandwidth_bound_efficiency_4to16": round(best[16] / best[4] / 4, 3),
        "max_bandwidth_bound_efficiency_8to32": round(best[32] / best[8] / 4, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
