"""Bisect the Gorilla chunks stage anti-scaling: sort vs Python encode vs
Arrow thread pools. Usage: python jobs/bisect_chunks.py --cores 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bronze", default="/dev/shm/bisect_bronze")
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import functions as F

    from mpnsm_spark.generator import generate_transcripts, with_value
    from mpnsm_spark.operators.gorilla import encode_tier_chunks
    from mpnsm_spark.operators.rollup import rollup_raw
    from mpnsm_spark.session import get_spark

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"bch_{args.cores}", cores=args.cores, shuffle_partitions=args.cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    if not os.path.exists(os.path.join(args.bronze, "_SUCCESS")):
        generate_transcripts(
            spark, n_convs=max(50, args.turns // 100), n_turns=args.turns,
            seed=42, shuffle_rows=False, num_partitions=64,
        ).write.mode("overwrite").parquet(args.bronze)

    raw = spark.read.parquet(args.bronze)
    tier = rollup_raw(with_value(raw).drop("text"), "1m").cache()
    n = tier.count()
    print(f"tier rows: {n}", flush=True)

    from jobs.profile_eventlog import ProcCpuSampler

    def t(name, df):
        with ProcCpuSampler() as cpu:
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
        print(f"{name:<22} {wall:7.1f}s  cpu={cpu.report()}", flush=True)

    prepared = (
        tier.select("conv_id", "bucket_start", F.col("value_avg").alias("_v"))
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "bucket_start")
    )
    t("sort_only", prepared)

    def passthrough(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    t("sort+python_noop", prepared.mapInPandas(passthrough, "n long"))
    t("full_encode", encode_tier_chunks(tier, "1m"))
    t("full_encode_again", encode_tier_chunks(tier, "1m"))

    # Pipeline-context variants: the pipeline also CACHES the chunk rows and
    # writes them to parquet (blobs) — bisect whether the write/cache path,
    # not the encode, is what anti-scales at high core counts.
    import shutil
    import tempfile

    def tp(name, df):
        dst = tempfile.mkdtemp(prefix="bch_", dir="/dev/shm")
        t0 = time.time()
        df.write.mode("overwrite").parquet(os.path.join(dst, "out"))
        print(f"{name:<22} {time.time() - t0:7.1f}s", flush=True)
        shutil.rmtree(dst, ignore_errors=True)

    enc = encode_tier_chunks(tier, "1m")
    tp("encode+parquet", enc)
    w = max(spark.sparkContext.defaultParallelism, 16)
    cached = enc.coalesce(w).cache()
    tp("encode+cache+parquet", cached)
    t("stats_over_cache", cached.groupBy("conv_id").count())
    cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
