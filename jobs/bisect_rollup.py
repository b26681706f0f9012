"""Bisect which part of rollup_encoded anti-scales at high core counts.

Runs variants of the dedupe→rollup stage at one core count and times each.
Usage: python jobs/bisect_rollup.py --cores 16 [--turns 8000000 --bronze DIR]
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

    from pyspark.sql import functions as F

    from mpnsm_spark.generator import generate_transcripts, with_value
    from mpnsm_spark.plans.pipeline import (
        dedupe_encoded,
        encode_role_tool,
        role_tool_vocabs,
    )
    from mpnsm_spark.session import get_spark

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"bisect_{args.cores}", cores=args.cores,
        shuffle_partitions=args.cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    if not os.path.exists(os.path.join(args.bronze, "_SUCCESS")):
        generate_transcripts(
            spark, n_convs=max(50, args.turns // 100), n_turns=args.turns,
            seed=42, shuffle_rows=False, num_partitions=64,
        ).write.mode("overwrite").parquet(args.bronze)

    raw = spark.read.parquet(args.bronze)
    narrow = with_value(raw).drop("text")
    role_vocab, tool_vocab = role_tool_vocabs(narrow)
    pre = encode_role_tool(narrow, role_vocab, tool_vocab)
    norm = dedupe_encoded(pre.repartition("conv_id"))

    bucket = F.date_trunc("minute", F.col("ts")).alias("bucket_start")
    bucket_long = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 60).alias("bs_long")

    def role_count(role_id: int):
        return F.sum(F.when(F.col("role_id") == role_id, 1).otherwise(0)).alias(
            f"n_{role_id}"
        )

    mask = F.when(
        F.col("tool_id") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), tool_id)")
    ).otherwise(F.lit(0).cast("long"))

    basic = [
        F.count(F.lit(1)).alias("turn_count"),
        F.min("turn_idx").alias("first_turn_idx"),
        F.max("turn_idx").alias("last_turn_idx"),
    ]
    roles = [role_count(i) for i in range(4)]
    vals = [
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    ]
    minmaxby = [
        F.min_by("value", "turn_idx").alias("first_value"),
        F.max_by("value", "turn_idx").alias("last_value"),
    ]
    bitor = [F.bit_or(mask).alias("tools_mask")]

    variants = {
        "dedupe_only": norm,
        "basic": norm.groupBy("conv_id", bucket).agg(*basic),
        "basic+roles": norm.groupBy("conv_id", bucket).agg(*basic, *roles),
        "basic+vals": norm.groupBy("conv_id", bucket).agg(*basic, *vals),
        "basic+bitor": norm.groupBy("conv_id", bucket).agg(*basic, *bitor),
        "basic+minmaxby": norm.groupBy("conv_id", bucket).agg(*basic, *minmaxby),
        "full": norm.groupBy("conv_id", bucket).agg(
            *basic, *roles, *vals, *minmaxby, *bitor
        ),
        "full_longbucket": norm.groupBy("conv_id", bucket_long).agg(
            *basic, *roles, *vals, *minmaxby, *bitor
        ),
    }
    from mpnsm_spark.operators.rollup import rollup_encoded, tools_from_mask

    full = norm.groupBy("conv_id", bucket).agg(
        *basic, *roles, *vals, *minmaxby, *bitor
    )
    variants["full+maskdecode"] = full.withColumn(
        "tools", tools_from_mask(F.col("tools_mask"), tool_vocab)
    )
    variants["full+bitcount"] = full.withColumn(
        "distinct_tools", F.bit_count("tools_mask").cast("int")
    )
    variants["rollup_encoded"] = rollup_encoded(norm, "1m", role_vocab, tool_vocab)
    for name, df in variants.items():
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name:<18} {time.time() - t0:7.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
