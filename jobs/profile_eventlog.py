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


def _open_eventlog(path: str):
    """Spark 4 writes zstd-framed rolling event logs; pyarrow decodes them."""
    if path.endswith(".zstd"):
        import io

        import pyarrow as pa

        stream = pa.CompressedInputStream(pa.OSFile(path), "zstd")
        return io.TextIOWrapper(io.BufferedReader(stream), encoding="utf-8")
    return open(path, encoding="utf-8", errors="replace")


def parse_eventlog(evdir: str) -> tuple[dict, dict]:
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
    stage_names: dict[str, str] = {}
    stage_wall: dict[str, float] = {}
    stage_desc: dict[str, str] = {}
    for path in paths:
        with _open_eventlog(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_desc[str(sid)] = desc
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info") or {}
                    sid = str(si.get("Stage ID"))
                    stage_names[sid] = (si.get("Stage Name") or "")[:60]
                    if si.get("Submission Time") and si.get("Completion Time"):
                        stage_wall[sid] = (
                            si["Completion Time"] - si["Submission Time"]
                        ) / 1000.0
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
    for sid, s in by_stage.items():
        s["name"] = (stage_desc.get(sid, "") + " " + stage_names.get(sid, ""))[:60]
        s["wall_s"] = stage_wall.get(sid, 0.0)
    return tot, by_stage


def report(tot: dict, by_stage: dict, cores: int, wall: float | None) -> None:
    if wall:
        core_s = cores * wall
        print(f"\ntotal core-seconds available: {core_s:,.0f}")
    else:
        core_s = None
    for k in ("run_ms", "cpu_ms", "gc_ms", "shuf_w_ms", "fetch_wait_ms",
              "deser_ms", "ser_ms"):
        pct = f"  ({tot[k]/1000/core_s*100:5.1f}% of cores)" if core_s else ""
        print(f"  {k:<14} {tot[k]/1000:10,.1f}s{pct}")
    print(f"  tasks          {tot['tasks']:10,}")
    print(f"  run-but-not-cpu (python/IO/lock wait): "
          f"{(tot['run_ms'] - tot['cpu_ms'])/1000:,.1f}s")
    top = sorted(by_stage.values(), key=lambda s: -s["run_ms"])[:14]
    print(f"\n{'stage':>6} {'tasks':>6} {'wall_s':>7} {'run_s':>8} {'cpu_s':>8} "
          f"{'gc_s':>7} {'notcpu_s':>9}  name")
    for s in top:
        print(f"{s['stage']:>6} {s['tasks']:>6} {s.get('wall_s', 0):>7.1f} "
              f"{s['run_ms']/1000:>8.1f} "
              f"{s['cpu_ms']/1000:>8.1f} {s['gc_ms']/1000:>7.1f} "
              f"{(s['run_ms']-s['cpu_ms'])/1000:>9.1f}  {s.get('name','')}")


class ProcCpuSampler:
    """System-wide per-comm CPU accounting via /proc/<pid>/stat deltas —
    separates JVM cycles from python-worker cycles (task metrics only see
    the JVM side of a pandas-UDF stage)."""

    def __init__(self):
        import threading

        self.totals: dict[str, float] = {}
        self._prev: dict[int, tuple[str, int]] = {}
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._hz = os.sysconf("SC_CLK_TCK")

    def _sample(self):
        import glob as g

        cur: dict[int, tuple[str, int]] = {}
        for p in g.glob("/proc/[0-9]*/stat"):
            try:
                with open(p) as fh:
                    raw = fh.read()
            except OSError:
                continue
            # comm may contain spaces — it is parenthesized
            lp, rp = raw.find("("), raw.rfind(")")
            comm = raw[lp + 1 : rp]
            f = raw[rp + 2 :].split()
            ticks = int(f[11]) + int(f[12])  # utime + stime
            cur[int(p.split("/")[2])] = (comm, ticks)
        for pid, (comm, ticks) in cur.items():
            pcomm, pticks = self._prev.get(pid, (comm, 0))
            d = ticks - (pticks if pcomm == comm else 0)
            if d > 0:
                self.totals[comm] = self.totals.get(comm, 0.0) + d / self._hz
        self._prev = cur

    def _run(self):
        while not self._stop.wait(1.0):
            self._sample()

    def __enter__(self):
        # Baseline pass: record existing processes' cumulative ticks WITHOUT
        # accumulating them (their pre-run lifetime is not this run's CPU).
        self._sample()
        self.totals = {}
        self._t.start()
        return self

    def __exit__(self, *e):
        self._stop.set()
        self._t.join(timeout=5)
        self._sample()

    def report(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for comm, s in self.totals.items():
            key = (
                "java"
                if comm == "java"
                else "python" if comm.startswith("python") else "other"
            )
            out[key] = out.get(key, 0.0) + s
        top = sorted(self.totals.items(), key=lambda kv: -kv[1])[:4]
        out["top"] = ",".join(f"{c}:{s:.0f}" for c, s in top)
        return {
            k: round(v, 1) if isinstance(v, float) else v
            for k, v in sorted(out.items())
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bronze", default="/dev/shm/evl_bronze")
    ap.add_argument("--parse", help="parse an existing event-log dir and exit")
    args = ap.parse_args()

    if args.parse:
        tot, by_stage = parse_eventlog(args.parse)
        report(tot, by_stage, args.cores, None)
        return

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
    with ProcCpuSampler() as cpu:
        t0 = time.time()
        summary = run_pipeline(
            spark, raw, TableIO(wh),
            PipelineConfig(num_buckets=64, points_per_chunk=4096),
        )
        wall = time.time() - t0
    print(f"\nprocess CPU-seconds during run: {cpu.report()}")
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)

    tot, by_stage = parse_eventlog(evdir)
    shutil.rmtree(evdir, ignore_errors=True)
    print(f"\ncores={args.cores} wall={wall:.1f}s "
          f"turns={summary['input_turns']}")
    print(f"stage_seconds={summary['stage_seconds']}")
    report(tot, by_stage, args.cores, wall)


if __name__ == "__main__":
    main()
