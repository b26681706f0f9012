"""Hash vs sort-based aggregation for the near-unique-key tier_1m path.

The dedupe (keep-last per (conv_id, turn_idx)) and the 1m rollup both have
~no key reduction, so hash aggregation degenerates into building multi-
million-entry hash maps probed at DRAM latency — measured ~flat from 4 to 16
cores on this box. Sort-based streaming aggregation (explicit in-partition
sort + spark.sql.execution.replaceHashWithSortAgg) trades the random probes
for sequential runs.

Usage: python jobs/bisect_sortagg.py --cores 16 [--turns 20000000]
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
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bronze", default="/dev/shm/bisect_bronze")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mpnsm_spark.generator import generate_transcripts, with_value
    from mpnsm_spark.operators.rollup import rollup_encoded
    from mpnsm_spark.plans.pipeline import (
        dedupe_encoded,
        encode_role_tool,
        role_tool_vocabs,
    )
    from mpnsm_spark.session import get_spark

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"bsa_{args.cores}", cores=args.cores,
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

    def t(name, df, sortagg=False):
        spark.conf.set(
            "spark.sql.execution.replaceHashWithSortAgg.enabled",
            "true" if sortagg else "false",
        )
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name:<28} {time.time() - t0:7.1f}s", flush=True)

    part = pre.repartition("conv_id")
    sorted_part = part.sortWithinPartitions("conv_id", "turn_idx")

    norm_hash = dedupe_encoded(part)
    norm_sort = dedupe_encoded(sorted_part)
    t("dedupe_hash", norm_hash)
    t("dedupe_sortagg", norm_sort, sortagg=True)

    r_hash = rollup_encoded(norm_hash, "1m", role_vocab, tool_vocab)
    t("full_hash_hash", r_hash)

    r_mixed = rollup_encoded(norm_sort, "1m", role_vocab, tool_vocab)
    t("full_sortdedupe_hashrollup", r_mixed, sortagg=True)

    bucketed = norm_sort.sortWithinPartitions(
        "conv_id", F.date_trunc("minute", F.col("ts"))
    )
    r_sorted = rollup_encoded(bucketed, "1m", role_vocab, tool_vocab)
    t("full_sort_both", r_sorted, sortagg=True)
    t("full_hash_again", r_hash)
    spark.stop()


if __name__ == "__main__":
    main()
