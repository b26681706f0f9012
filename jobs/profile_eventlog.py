"""Run the pipeline once with the Spark event log enabled and attribute
core-seconds: executor run vs CPU vs GC vs shuffle vs python, per stage.

Usage: python jobs/profile_eventlog.py --cores 16 [--turns 20000000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bronze", default="/dev/shm/evl_bronze")
    args = ap.parse_args()

    from mpnsm_spark.generator import generate_transcripts
    from mpnsm_spark.plans.pipeline import PipelineConfig, run_pipeline
    from mpnsm_spark.session import get_spark
    from mpnsm_spark.sources.tableio import TableIO

    evdir = tempfile.mkdtemp(prefix=f"evlog_{args.cores}_", dir="/dev/shm")
    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)

    if not os.path.exists(os.path.join(args.bronze, "_SUCCESS")):
        spark = get_spark("evl_gen", cores=32, shuffle_partitions=64)
        generate_transcripts(
            spark, n_convs=max(50, args.turns // 100), n_turns=args.turns,
            seed=42, shuffle_rows=False, num_partitions=64,
        ).write.mode("overwrite").parquet(args.bronze)
        spark.stop()

    spark = get_spark(
        f"evl_{args.cores}", cores=args.cores,
        shuffle_partitions=args.cores * 2,
        extra_conf={
            "spark.local.dir": shm,
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )
    raw = spark.read.parquet(args.bronze)
    wh = tempfile.mkdtemp(prefix=f"evl_wh_{args.cores}_", dir="/dev/shm")
    t0 = time.time()
    summary = run_pipeline(
        spark, raw, TableIO(wh),
        PipelineConfig(num_buckets=64, points_per_chunk=4096),
    )
    wall = time.time() - t0
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)

    tot = {
        "run_ms": 0, "cpu_ms": 0, "gc_ms": 0, "shuf_w_ms": 0,
        "deser_ms": 0, "ser_ms": 0, "fetch_wait_ms": 0, "tasks": 0,
    }
    by_stage: dict[str, dict] = {}
    paths = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ev.get("Task Metrics") or {}
                if not m:
                    continue
                sid = str(ev.get("Stage ID"))
                s = by_stage.setdefault(
                    sid, {k: 0 for k in tot} | {"stage": sid}
                )
                for d in (tot, s):
                    d["run_ms"] += m.get("Executor Run Time", 0)
                    d["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    d["gc_ms"] += m.get("JVM GC Time", 0)
                    d["shuf_w_ms"] += (
                        (m.get("Shuffle Write Metrics") or {}).get(
                            "Shuffle Write Time", 0
                        ) // 1_000_000
                    )
                    d["fetch_wait_ms"] += (
                        (m.get("Shuffle Read Metrics") or {}).get(
                            "Fetch Wait Time", 0
                        )
                    )
                    d["deser_ms"] += m.get("Executor Deserialize Time", 0)
                    d["ser_ms"] += m.get("Result Serialization Time", 0)
                    d["tasks"] += 1

    shutil.rmtree(evdir, ignore_errors=True)
    print(f"\ncores={args.cores} wall={wall:.1f}s "
          f"turns={summary['input_turns']}")
    print(f"stage_seconds={summary['stage_seconds']}")
    core_s = args.cores * wall
    print(f"\ntotal core-seconds available: {core_s:,.0f}")
    for k in ("run_ms", "cpu_ms", "gc_ms", "shuf_w_ms", "fetch_wait_ms",
              "deser_ms", "ser_ms"):
        print(f"  {k:<14} {tot[k]/1000:10,.1f}s  ({tot[k]/1000/core_s*100:5.1f}% of cores)")
    print(f"  tasks          {tot['tasks']:10,}")
    print(f"  run-but-not-cpu (python/IO/lock wait): "
          f"{(tot['run_ms'] - tot['cpu_ms'])/1000:,.1f}s")
    top = sorted(by_stage.values(), key=lambda s: -s["run_ms"])[:12]
    print(f"\n{'stage':>6} {'tasks':>6} {'run_s':>8} {'cpu_s':>8} {'gc_s':>7} {'notcpu_s':>9}")
    for s in top:
        print(f"{s['stage']:>6} {s['tasks']:>6} {s['run_ms']/1000:>8.1f} "
              f"{s['cpu_ms']/1000:>8.1f} {s['gc_ms']/1000:>7.1f} "
              f"{(s['run_ms']-s['cpu_ms'])/1000:>9.1f}")


if __name__ == "__main__":
    main()
