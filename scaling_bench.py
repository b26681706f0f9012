"""Scaling-efficiency evidence: same pipeline, same input, local[8] vs local[32].

The north rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so per the task
instructions we evidence it by running the identical job at two parallelism
levels on identical input and reporting throughput at both plus
``efficiency = (throughput_4N / throughput_N) / 4``.

Protocol (holds everything constant except core count):
- one bronze parquet input, generated once (deterministic, seed 42);
- each measurement runs in a FRESH subprocess (own JVM) so no cache/JIT leaks
  between runs; shuffle partitions scale with cores; AQE on in both;
- pipeline = normalize → 1m/1h/1d tiers → gap-fill(1h,1d) → Gorilla chunks →
  retention + lineage (the full tier-materialization job, single wave).

Usage:  python scaling_bench.py [--turns 4000000] [--cores 8 32]
Writes SCALING.json and prints the summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


class _StealSampler:
    """Samples hypervisor CPU-steal % while a measurement runs — this sandbox
    is a shared microVM; steal bursts are the dominant noise source and hit
    wide (32-thread) runs much harder than narrow ones."""

    def __init__(self):
        import threading

        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _read(self):
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = list(map(int, parts[1:]))
        return sum(vals), vals[7] if len(vals) > 7 else 0

    def _run(self):
        prev_tot, prev_st = self._read()
        while not self._stop.wait(2.0):
            tot, st = self._read()
            if tot > prev_tot:
                self.samples.append(100.0 * (st - prev_st) / (tot - prev_tot))
            prev_tot, prev_st = tot, st

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)

    def stats(self) -> dict:
        if not self.samples:
            return {"steal_avg_pct": 0.0, "steal_max_pct": 0.0}
        return {
            "steal_avg_pct": round(sum(self.samples) / len(self.samples), 2),
            "steal_max_pct": round(max(self.samples), 2),
        }


def child(bronze: str, cores: int, out_path: str) -> None:
    from mpnsm_spark.plans.pipeline import PipelineConfig, run_pipeline
    from mpnsm_spark.session import get_spark
    from mpnsm_spark.sources.tableio import TableIO

    # Shuffle/spill and warehouse on tmpfs (RAM-rich box, single slow virtio
    # disk; a real cluster has parallel S3/HDFS) — applied identically at BOTH
    # core counts so the comparison stays fair.
    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"scaling_{cores}",
        cores=cores,
        shuffle_partitions=cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    raw = spark.read.parquet(bronze)
    wh = tempfile.mkdtemp(prefix=f"scal_wh_{cores}_", dir="/dev/shm")
    try:
        with _StealSampler() as steal:
            t0 = time.time()
            # num_buckets is part of the WORKLOAD (commit granularity), so it
            # is held constant across core counts; only parallelism varies.
            summary = run_pipeline(
                spark,
                raw,
                TableIO(wh),
                PipelineConfig(num_buckets=64, points_per_chunk=4096),
            )
            wall = time.time() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "cores": cores,
                "wall_seconds": round(wall, 3),
                "input_turns": summary["input_turns"],
                "turns_per_sec": round(summary["input_turns"] / wall, 1),
                **steal.stats(),
            },
            fh,
        )
    spark.stop()


def _burn(seconds: float) -> int:
    t = time.time()
    x = 0
    while time.time() - t < seconds:
        x += 1
    return x


def cpu_capacity(n: int, seconds: float = 3.0) -> float:
    """Measured machine CPU capacity at n concurrent processes (single-box
    reality check: frequency scaling means 4× cores < 4× capacity)."""
    import multiprocessing as mp

    with mp.Pool(n) as p:
        return float(sum(p.map(_burn, [seconds] * n)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--bronze")
    ap.add_argument("--child-cores", type=int)
    ap.add_argument("--out")
    args = ap.parse_args()

    if args.child:
        child(args.bronze, args.child_cores, args.out)
        return

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="scaling_", dir=base)
    bronze = os.path.join(tmp, "bronze")
    try:
        from mpnsm_spark.generator import generate_transcripts
        from mpnsm_spark.session import get_spark

        spark = get_spark("scaling_gen", cores=32, shuffle_partitions=64)
        generate_transcripts(
            spark,
            n_convs=max(50, args.turns // 100),
            n_turns=args.turns,
            seed=42,
            shuffle_rows=False,
            num_partitions=64,
        ).write.mode("overwrite").parquet(bronze)
        spark.stop()

        results = []
        for cores in args.cores:
            best = None
            for rep in range(args.repeats):
                out = os.path.join(tmp, f"r{cores}_{rep}.json")
                subprocess.run(
                    [
                        sys.executable, __file__, "--child", "--bronze", bronze,
                        "--child-cores", str(cores), "--out", out,
                    ],
                    check=True,
                )
                with open(out) as fh:
                    r = json.load(fh)
                print(f"run cores={cores} rep={rep}: {r}", flush=True)
                if best is None or r["wall_seconds"] < best["wall_seconds"]:
                    best = r
            results.append(best)

        # Machine CPU-capacity baseline at both levels (the single-box ceiling:
        # all-core frequency < few-core turbo, so 4x cores < 4x capacity even
        # for embarrassingly parallel work). On a real multi-executor cluster
        # 4x executors IS 4x capacity; this normalization documents the gap.
        cap_lo = cpu_capacity(args.cores[0])
        cap_hi = cpu_capacity(args.cores[1])
        hw_ratio = cap_hi / cap_lo

        lo, hi = results
        ratio = hi["turns_per_sec"] / lo["turns_per_sec"]
        core_ratio = hi["cores"] / lo["cores"]
        efficiency = ratio / core_ratio
        report = {
            "input_turns": lo["input_turns"],
            "runs": results,
            "repeats": args.repeats,
            "speedup": round(ratio, 3),
            "core_ratio": core_ratio,
            "scaling_efficiency": round(efficiency, 3),
            "hw_capacity_ratio": round(hw_ratio, 3),
            "hw_ceiling_efficiency": round(hw_ratio / core_ratio, 3),
            "efficiency_vs_hw_ceiling": round(ratio / hw_ratio, 3),
            "target": 0.8,
            "pass": efficiency >= 0.8,
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json"), "w") as fh:
            json.dump(report, fh, indent=2)
        print(json.dumps(report))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
