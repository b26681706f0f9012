"""Memory-bandwidth capacity probe: n processes each streaming over a fixed
buffer (numpy copy ~ STREAM copy kernel). Complements the sha256 (cache-
resident compute) probe in scaling_bench: Spark aggregation/shuffle/parquet
work is partly DRAM-bound, and on a single box DRAM bandwidth is SHARED —
4x threads is NOT 4x bandwidth, while on a real multi-executor cluster it is.

Usage: python jobs/membw_probe.py [--procs 1 4 8 16 32]
Prints GB/s at each process count (best of 3, steal-gated).
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUF_MB = 256
PASSES = 20


def _stream(_: int) -> float:
    import numpy as np

    a = np.ones(BUF_MB * 1024 * 1024 // 8, np.float64)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(PASSES):
        np.copyto(b, a)
    dt = time.time() - t0
    # copy reads + writes the buffer: 2 * BUF * PASSES bytes touched
    return 2 * BUF_MB / 1024 * PASSES / dt  # GB/s per process


def measure(n: int, reps: int = 3) -> float:
    from scaling_bench import wait_quiet

    best = 0.0
    for _ in range(reps):
        wait_quiet(max_wait_s=60, consecutive=1)
        with mp.Pool(n) as p:
            t0 = time.time()
            rates = p.map(_stream, range(n))
            wall = time.time() - t0
        agg = n * 2 * BUF_MB / 1024 * PASSES / wall
        best = max(best, agg)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 4, 8, 16, 32])
    args = ap.parse_args()
    per_proc_base = None
    for n in args.procs:
        bw = measure(n)
        if per_proc_base is None:
            per_proc_base = bw / n
        eff = bw / (per_proc_base * n)
        print(
            f"procs={n:<3} aggregate={bw:7.1f} GB/s  vs_linear={eff:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
