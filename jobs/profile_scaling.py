"""Per-stage scaling profile: run the pipeline at two core counts on the same
bronze input and print stage_seconds side-by-side. Diagnostic tool for the
SCALING.json gate — not part of the measured protocol (scaling_bench.py is).

Usage: python jobs/profile_scaling.py [--turns 8000000] [--cores 4 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(bronze: str, cores: int, out_path: str) -> None:
    from mpnsm_spark.plans.pipeline import PipelineConfig, run_pipeline
    from mpnsm_spark.session import get_spark
    from mpnsm_spark.sources.tableio import TableIO

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"profile_{cores}",
        cores=cores,
        shuffle_partitions=cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    raw = spark.read.parquet(bronze)
    wh = tempfile.mkdtemp(prefix=f"prof_wh_{cores}_", dir="/dev/shm")
    from scaling_bench import _StealSampler

    import threading

    class _CpuSampler:
        """VM-wide busy-cores sampler (nothing else runs on the box)."""

        def __init__(self):
            self.samples = []
            self._stop = threading.Event()
            self._t = threading.Thread(target=self._run, daemon=True)

        def _read(self):
            with open("/proc/stat") as fh:
                v = list(map(int, fh.readline().split()[1:]))
            busy = v[0] + v[1] + v[2] + v[5] + v[6]  # user+nice+sys+irq+softirq
            return sum(v), busy

        def _run(self):
            pt, pb = self._read()
            while not self._stop.wait(1.0):
                t, b = self._read()
                if t > pt:
                    self.samples.append(
                        (time.time(), os.cpu_count() * (b - pb) / (t - pt))
                    )
                pt, pb = t, b

        def __enter__(self):
            self._t.start()
            return self

        def __exit__(self, *e):
            self._stop.set()
            self._t.join(timeout=5)

    try:
        import time

        with _StealSampler() as steal, _CpuSampler() as cpu:
            t0 = time.time()
            summary = run_pipeline(
                spark, raw, TableIO(wh),
                PipelineConfig(num_buckets=64, points_per_chunk=4096),
            )
            summary["wall_seconds"] = round(time.time() - t0, 3)
        summary["cores"] = cores
        summary.update(steal.stats())
        vals = [c for _, c in cpu.samples]
        summary["busy_cores_avg"] = round(sum(vals) / max(len(vals), 1), 2)
        summary["busy_cores_p90"] = round(
            sorted(vals)[int(0.9 * len(vals))] if vals else 0.0, 2
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    with open(out_path, "w") as fh:
        json.dump(summary, fh)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--bronze")
    ap.add_argument("--child-cores", type=int)
    ap.add_argument("--out")
    args = ap.parse_args()

    if args.child:
        child(args.bronze, args.child_cores, args.out)
        return

    from scaling_bench import wait_quiet

    tmp = tempfile.mkdtemp(prefix="prof_", dir="/dev/shm")
    bronze = os.path.join(tmp, "bronze")
    try:
        from mpnsm_spark.generator import generate_transcripts
        from mpnsm_spark.session import get_spark

        spark = get_spark("prof_gen", cores=32, shuffle_partitions=64)
        generate_transcripts(
            spark,
            n_convs=max(50, args.turns // 100),
            n_turns=args.turns,
            seed=42,
            shuffle_rows=False,
            num_partitions=64,
        ).write.mode("overwrite").parquet(bronze)
        spark.stop()

        summaries = []
        for cores in args.cores:
            best = None
            for rep in range(args.repeats):
                wait_quiet(max_wait_s=300)
                out = os.path.join(tmp, f"p{cores}_{rep}.json")
                pin = (
                    ["taskset", "-c", f"0-{cores - 1}"]
                    if os.environ.get("PROFILE_PIN", "1") == "1"
                    else []
                )
                subprocess.run(
                    [*pin, sys.executable, __file__, "--child", "--bronze", bronze,
                     "--child-cores", str(cores), "--out", out],
                    check=True, cwd=REPO,
                )
                with open(out) as fh:
                    r = json.load(fh)
                print(f"cores={cores} rep={rep}: wall={r['wall_seconds']} "
                      f"steal_avg={r['steal_avg_pct']} steal_max={r['steal_max_pct']} "
                      f"busy_avg={r.get('busy_cores_avg')} busy_p90={r.get('busy_cores_p90')}",
                      flush=True)
                if best is None or r["wall_seconds"] < best["wall_seconds"]:
                    best = r
            summaries.append(best)

        stages = list(summaries[0]["stage_seconds"])
        print(f"\n{'stage':<16}" + "".join(f"{s['cores']:>10}c" for s in summaries) + "   speedup")
        for st in stages:
            vals = [s["stage_seconds"].get(st, float('nan')) for s in summaries]
            sp = vals[0] / vals[-1] if vals[-1] else float("nan")
            print(f"{st:<16}" + "".join(f"{v:>10.1f}" for v in vals) + f"   {sp:>6.2f}x")
        for ph in summaries[0]["phase_seconds"]:
            vals = [s["phase_seconds"][ph] for s in summaries]
            sp = vals[0] / vals[-1] if vals[-1] else float("nan")
            print(f"{ph:<16}" + "".join(f"{v:>10.1f}" for v in vals) + f"   {sp:>6.2f}x")
        vals = [s["wall_seconds"] for s in summaries]
        print(f"{'TOTAL':<16}" + "".join(f"{v:>10.1f}" for v in vals)
              + f"   {vals[0]/vals[-1]:>6.2f}x")
        tp = [s["input_turns"] / s["wall_seconds"] for s in summaries]
        ratio = tp[-1] / tp[0]
        cores_ratio = summaries[-1]["cores"] / summaries[0]["cores"]
        print(f"throughput: {tp[0]:,.0f} -> {tp[-1]:,.0f} turns/s  "
              f"efficiency {ratio/cores_ratio:.3f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
