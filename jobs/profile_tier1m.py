"""Micro-profile the tier_1m stage's sub-plans at two core counts.

Variants (each fully materialized via noop sink unless noted):
  scan      — narrow parquet scan only
  dedupe    — scan + repartition(conv_id) + keep-last dedupe
  rollup    — dedupe + 1m rollup
  write     — rollup + parquet write to /dev/shm
Diagnostic only. Usage: python jobs/profile_tier1m.py [--turns 8000000]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(bronze: str, cores: int, out_path: str) -> None:
    from pyspark.sql import functions as F

    from mpnsm_spark.plans.pipeline import (
        dedupe_encoded,
        encode_role_tool,
        role_tool_vocabs,
    )
    from mpnsm_spark.generator import with_value
    from mpnsm_spark.operators.rollup import rollup_encoded
    from mpnsm_spark.session import get_spark

    shm = "/dev/shm/spark_local"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"t1m_{cores}", cores=cores, shuffle_partitions=cores * 2,
        extra_conf={"spark.local.dir": shm},
    )
    raw = spark.read.parquet(bronze)
    narrow = with_value(raw).drop("text")
    role_vocab, tool_vocab = role_tool_vocabs(narrow)
    pre = encode_role_tool(narrow, role_vocab, tool_vocab)
    norm = dedupe_encoded(pre.repartition("conv_id"))
    t1m = rollup_encoded(norm, "1m", role_vocab, tool_vocab)

    timings: dict[str, float] = {}

    def t(name, df, parquet=False):
        t0 = time.time()
        if parquet:
            dst = tempfile.mkdtemp(prefix="t1m_", dir="/dev/shm")
            try:
                df.write.mode("overwrite").parquet(os.path.join(dst, "out"))
            finally:
                shutil.rmtree(dst, ignore_errors=True)
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)

    t("scan", narrow)
    t("dedupe", norm)
    t("rollup", t1m)
    t("write", t1m, parquet=True)
    with open(out_path, "w") as fh:
        json.dump({"cores": cores, **timings}, fh)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--bronze")
    ap.add_argument("--child-cores", type=int)
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.child:
        child(args.bronze, args.child_cores, args.out)
        return

    from scaling_bench import wait_quiet

    tmp = tempfile.mkdtemp(prefix="t1m_", dir="/dev/shm")
    bronze = os.path.join(tmp, "bronze")
    try:
        from mpnsm_spark.generator import generate_transcripts
        from mpnsm_spark.session import get_spark

        spark = get_spark("t1m_gen", cores=32, shuffle_partitions=64)
        generate_transcripts(
            spark, n_convs=max(50, args.turns // 100), n_turns=args.turns,
            seed=42, shuffle_rows=False, num_partitions=64,
        ).write.mode("overwrite").parquet(bronze)
        spark.stop()

        outs = []
        for cores in args.cores:
            wait_quiet(max_wait_s=300)
            out = os.path.join(tmp, f"c{cores}.json")
            subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}",
                 sys.executable, __file__, "--child", "--bronze", bronze,
                 "--child-cores", str(cores), "--out", out],
                check=True, cwd=REPO,
            )
            with open(out) as fh:
                outs.append(json.load(fh))
        keys = [k for k in outs[0] if k != "cores"]
        print(f"\n{'variant':<10}" + "".join(f"{o['cores']:>9}c" for o in outs) + "   speedup")
        for k in keys:
            vals = [o[k] for o in outs]
            print(f"{k:<10}" + "".join(f"{v:>9.1f}" for v in vals)
                  + f"   {vals[0]/max(vals[-1],0.01):>6.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
