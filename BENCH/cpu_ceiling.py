"""Pure-CPU scaling ceiling of this host under the SAME pinned methodology
as BENCH/scaling.py: a fixed CPU-bound workload (blake2b hashing, no IO,
no Spark) split over k processes, run under taskset -c 0-(k-1).  The
resulting efficiency is the best ANY job could measure between these two
CPU counts on this VM — the normalization denominator BASELINE.md cites.

Usage: python BENCH/cpu_ceiling.py [n_low] [n_high] [rounds]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

WORK_ITEMS = 2048 # fixed total work, split over k procs
ITEM_BYTES = 2_000_000


def _one(_: int) -> int:
    h = hashlib.blake2b()
    h.update(b"x" * ITEM_BYTES)
    for _ in range(40000):
        h.update(h.digest())
    return h.digest()[0]


def run(k: int) -> float:
    t0 = time.time()
    with mp.Pool(k) as p:
        p.map(_one, range(WORK_ITEMS), chunksize=max(1, WORK_ITEMS // (k * 8)))
    return time.time() - t0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print(run(int(sys.argv[2])))
        return
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    best = {n_low: 1e9, n_high: 1e9}
    for _ in range(rounds):
        for k in (n_low, n_high):
            out = subprocess.run(
                ["taskset", "-c", f"0-{k-1}", sys.executable,
                 os.path.abspath(__file__), "--leg", str(k)],
                capture_output=True, text=True, check=True,
            )
            best[k] = min(best[k], float(out.stdout.strip()))
    eff = (best[n_low] / best[n_high]) / (n_high / n_low)
    print(json.dumps({
        "low_secs": round(best[n_low], 2), "high_secs": round(best[n_high], 2),
        "ceiling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
