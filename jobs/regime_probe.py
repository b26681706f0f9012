"""Host-regime study: burst-credit drain/recovery + true DRAM bandwidth.

Round-3 verdict found two contradictions in the shipped scaling evidence:
(1) SCALING.json membw_gbps read {4: 6.0, 16: 62.1} (bandwidth *scaling*
10x) while BASELINE.md asserted saturation at ~5.5 GB/s by 4 procs; and
(2) the post-pair throttle-probe array was all-null while the narrative
cited 2.5-2.6x readings. Both trace to the same root: every probe's value
depends on WHEN it runs relative to heavy load, and the old harness ran
them at uncontrolled times. This script measures the host regime itself,
deliberately:

  A. fresh-credit baseline: absolute fixed-work capacity at 1/4/16 procs
     and STREAM-copy bandwidth at 4/16 procs, INTERLEAVED reps so a regime
     shift between the 4-proc and 16-proc readings cannot masquerade as
     (anti-)scaling;
  B. controlled drain: a fixed-length 16-proc compute burn (a stand-in for
     the wide pipeline run);
  C. recovery timeline: absolute 16-proc capacity sampled on a schedule
     after the drain until it returns to the fresh baseline -- this yields
     the cooldown length the pair protocol needs;
  D. throttled-window bandwidth: membw re-measured immediately after the
     drain, to test the hypothesis that the round-2 "5.5 GB/s flat"
     readings were throttle artifacts rather than DRAM saturation.

Writes jobs/regime_probe_out.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_bench import wait_quiet  # noqa: E402


def _burn_fixed(work: int) -> int:
    import hashlib

    h = b"x" * 64
    for _ in range(work):
        h = hashlib.sha256(h).digest()
    return 0


def capacity_abs(n: int, work: int = 600_000) -> float:
    """Absolute hashes/sec at n pinned concurrent processes (~1-3 s).
    Unlike the ratio probe in scaling_bench, the ABSOLUTE value is kept:
    in a drained-credit regime both sides of a ratio sink, so only the
    absolute number shows how far below fresh-credit speed the box is."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    cpus = set(range(min(n, os.cpu_count() or n)))
    with ctx.Pool(
        len(cpus), initializer=os.sched_setaffinity, initargs=(0, cpus)
    ) as p:
        t0 = time.time()
        p.map(_burn_fixed, [work] * n)
        wall = time.time() - t0
    return n * work / wall


def _membw_stream(mb: int) -> float:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, np.float64)
    b = np.empty_like(a)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        np.copyto(b, a)
    wall = time.time() - t0
    return reps * 2 * mb / 1024.0 / wall  # GB touched per second, this proc


def membw(n: int, mb: int = 192) -> float:
    """Aggregate copy bandwidth (GB/s) at n concurrent pinned processes.
    192 MB buffers >> L3, so this is DRAM, not cache."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    cpus = set(range(min(n, os.cpu_count() or n)))
    with ctx.Pool(
        len(cpus), initializer=os.sched_setaffinity, initargs=(0, cpus)
    ) as p:
        t0 = time.time()
        p.map(_membw_stream, [mb] * n)
        wall = time.time() - t0
    return n * 2 * mb / 1024.0 * 4 / wall


def drain(seconds: float, n: int = 16) -> None:
    """Sustained n-proc compute for ~`seconds` -- a controlled stand-in for
    a wide pipeline run, to deplete whatever burst quota the host grants."""
    import multiprocessing as mp

    # calibrate work per chunk from a 1-proc sample
    t0 = time.time()
    _burn_fixed(200_000)
    per = (time.time() - t0) / 200_000
    chunk = max(100_000, int(2.0 / per))
    deadline = time.time() + seconds
    ctx = mp.get_context("fork")
    with ctx.Pool(n) as p:
        while time.time() < deadline:
            p.map(_burn_fixed, [chunk] * n)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--drain-seconds", type=float, default=120.0)
    ap.add_argument("--recovery-minutes", type=float, default=14.0)
    ap.add_argument("--interleave-reps", type=int, default=3)
    args = ap.parse_args()

    out: dict = {"phases": {}}

    # ---- A: fresh-credit baseline (interleaved) -------------------------
    print("phase A: waiting for a quiet window...", flush=True)
    wait_quiet(max_wait_s=300)
    base = {"cap": {"1": [], "4": [], "16": []}, "bw": {"4": [], "16": []}}
    for rep in range(args.interleave_reps):
        for n in (1, 4, 16):
            base["cap"][str(n)].append(round(capacity_abs(n), 0))
        for n in (4, 16):
            base["bw"][str(n)].append(round(membw(n), 1))
        print(f"  rep {rep}: cap={ {k: v[-1] for k, v in base['cap'].items()} } "
              f"bw={ {k: v[-1] for k, v in base['bw'].items()} }", flush=True)
        time.sleep(5)
    out["phases"]["A_fresh_baseline"] = base
    cap16_fresh = max(base["cap"]["16"])
    cap4_fresh = max(base["cap"]["4"])
    cap1_fresh = max(base["cap"]["1"])

    # ---- B: controlled drain --------------------------------------------
    print(f"phase B: draining with 16-proc burn for {args.drain_seconds}s",
          flush=True)
    t_drain0 = time.time()
    drain(args.drain_seconds)
    out["phases"]["B_drain_seconds"] = round(time.time() - t_drain0, 1)

    # ---- D first (immediately post-drain): throttled-window bandwidth ---
    bw_throttled = {"4": round(membw(4), 1), "16": round(membw(16), 1)}
    cap_throttled = {"1": round(capacity_abs(1), 0),
                     "4": round(capacity_abs(4), 0),
                     "16": round(capacity_abs(16), 0)}
    out["phases"]["D_post_drain"] = {"bw": bw_throttled, "cap": cap_throttled}
    print(f"phase D (post-drain): bw={bw_throttled} cap={cap_throttled}",
          flush=True)

    # ---- C: recovery timeline --------------------------------------------
    print("phase C: recovery timeline", flush=True)
    timeline = []
    t0 = time.time()
    deadline = t0 + args.recovery_minutes * 60
    while time.time() < deadline:
        time.sleep(30)
        c16 = capacity_abs(16)
        c1 = capacity_abs(1)
        pt = {
            "t_since_drain_s": round(time.time() - t0, 0),
            "cap16": round(c16, 0),
            "cap16_vs_fresh": round(c16 / cap16_fresh, 3),
            "cap1": round(c1, 0),
            "cap1_vs_fresh": round(c1 / cap1_fresh, 3),
        }
        timeline.append(pt)
        print(f"  {pt}", flush=True)
        if pt["cap16_vs_fresh"] >= 0.97 and len(timeline) >= 2 \
                and timeline[-2]["cap16_vs_fresh"] >= 0.97:
            break
    out["phases"]["C_recovery_timeline"] = timeline

    out["summary"] = {
        "cap_fresh": {"1": cap1_fresh, "4": cap4_fresh, "16": cap16_fresh},
        "cap_ratio_4_16_fresh": round(cap16_fresh / cap4_fresh, 3),
        "bw_fresh_gbps": {k: max(v) for k, v in base["bw"].items()},
        "bw_ratio_4_16_fresh": round(
            max(base["bw"]["16"]) / max(base["bw"]["4"]), 3),
        "bw_post_drain_gbps": bw_throttled,
        "cap16_post_drain_vs_fresh": round(
            cap_throttled["16"] / cap16_fresh, 3),
        "recovery_s_to_97pct": next(
            (p["t_since_drain_s"] for p in timeline
             if p["cap16_vs_fresh"] >= 0.97), None),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "regime_probe_out.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
