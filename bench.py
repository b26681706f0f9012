"""Benchmark: headline queries + full pipeline; prints ONE JSON line.

Contract (driver): run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]; output
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Two workloads:
1. every ``__spark_entry__.queries()`` entry on the sf-dir tables, fully
   materialized via the noop sink (no driver collect);
2. the flagship transcript pipeline (normalize → 1m/1h/1d tiers → gap-fill →
   Gorilla chunks → retention+lineage) on a deterministic synthetic transcript
   table sized ∝ sf (sf0.1 → 2M turns), pre-materialized to parquet so the
   measurement is engine time, not generator time. Reports rollup throughput
   in turns/sec (BASELINE.md metric).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    from mpnsm_spark.generator import generate_transcripts
    from mpnsm_spark.plans.pipeline import PipelineConfig, run_pipeline
    from mpnsm_spark.session import get_spark
    from mpnsm_spark.sources.tableio import TableIO

    import __spark_entry__ as em

    # Shuffle/spill + bench warehouse on tmpfs when available: this box has a
    # single slow virtio disk and bursty hypervisor steal; a real cluster has
    # parallel S3/HDFS. Keeps the measurement about the engine, not the disk.
    shm_ok = os.path.isdir("/dev/shm")
    extra = {}
    if shm_ok:
        local_dir = "/dev/shm/spark_local"
        os.makedirs(local_dir, exist_ok=True)
        extra["spark.local.dir"] = local_dir
    spark = get_spark(
        "bench", cores=cpus, shuffle_partitions=max(cpus, 8), extra_conf=extra
    )
    queries: dict[str, float] = {}

    # Untimed warmup: the session's FIRST jobs pay one-time costs (parquet
    # datasource + output committer init, JIT, codegen warm) that previously
    # landed entirely on whichever query ran first (~5-6s attributed to
    # tier_1m_rollup; the query itself re-measures at ~1s).
    spark.range(100_000).selectExpr("sum(id) as s").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).selectExpr(
        "count(*) as c"
    ).write.format("noop").mode("overwrite").save()

    for name, fn in em.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    # ---- flagship pipeline on synthetic transcripts sized by sf ------------
    turns = max(20_000, int(20_000_000 * sf))
    convs = max(50, turns // 100)
    tmp = tempfile.mkdtemp(prefix="bench_", dir="/dev/shm" if shm_ok else None)
    try:
        bronze = os.path.join(tmp, "bronze")
        generate_transcripts(
            spark, n_convs=convs, n_turns=turns, seed=42, shuffle_rows=False,
            num_partitions=max(cpus, 8),
        ).write.mode("overwrite").parquet(bronze)
        raw = spark.read.parquet(bronze)
        cfg = PipelineConfig(
            num_buckets=max(cpus, 8), points_per_chunk=4096, gapfill_tiers=("1h", "1d")
        )
        t0 = time.time()
        summary = run_pipeline(spark, raw, TableIO(os.path.join(tmp, "wh")), cfg)
        pipeline_sec = time.time() - t0
        queries["pipeline_full"] = round(pipeline_sec, 3)
        turns_per_sec = summary["input_turns"] / pipeline_sec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end_to_end_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "pipeline_turns": summary["input_turns"],
                "rollup_turns_per_sec": round(turns_per_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
