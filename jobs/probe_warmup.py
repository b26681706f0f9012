"""Break down the pipeline's serial 'plan_vocab' phase: JVM/session warmup
vs the first trivial job vs the vocab distinct scan vs lineage-map load.

Usage: taskset -c 0-15 python jobs/probe_warmup.py --cores 16
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
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bronze", default="/dev/shm/evl_bronze")
    args = ap.parse_args()

    from mpnsm_spark.generator import with_value
    from mpnsm_spark.plans.pipeline import role_tool_vocabs
    from mpnsm_spark.operators.skew import with_salt
    from mpnsm_spark.session import get_spark

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    t0 = time.time()
    spark = get_spark(
        f"warm_{args.cores}", cores=args.cores,
        shuffle_partitions=args.cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    t_sess = time.time()
    spark.range(1).count()
    t_first = time.time()
    raw = spark.read.parquet(args.bronze)
    t_read = time.time()
    raw_aug = with_salt(with_value(raw), 64)
    narrow = raw_aug.drop("text")
    t_plan = time.time()
    role_vocab, tool_vocab = role_tool_vocabs(narrow)
    t_vocab = time.time()
    role_vocab, tool_vocab = role_tool_vocabs(narrow)
    t_vocab2 = time.time()
    print(
        f"session={t_sess - t0:.2f}s first_job={t_first - t_sess:.2f}s "
        f"read_meta={t_read - t_first:.2f}s plan={t_plan - t_read:.2f}s "
        f"vocab_job={t_vocab - t_plan:.2f}s vocab_again={t_vocab2 - t_vocab:.2f}s "
        f"(roles={len(role_vocab)} tools={len(tool_vocab)})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
