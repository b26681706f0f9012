"""Deterministic synthetic transcript generator — pure Spark, no external data.

Shape per BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

Built entirely from ``spark.range`` + ``F.sequence``/``explode`` + hash-derived
columns so generation itself distributes: no driver-side row materialization,
no Python RNG on the executors. Conversation sizes are Zipf-distributed (a few
hot conversations) to exercise the skew machinery; inter-turn gaps include
deliberate >1h and >1d holes (gap-fill) and small-gap bursts (several turns in
one minute → rollup counts > 1).

Mirrors the fixture rules in FIXTURES.md §1. Reference analog: the long
multi-series input frame of mpnsm (``/root/reference/mpnsm/time_series/
manager.py:20-33``) — many series (conversations) in one long table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH_START = "2025-01-01 00:00:00"


def _zipf_sizes_expr(n_convs: int, n_turns: int, max_turns: int):
    """Column expr: Zipf(1) conversation size for conv index ``i``.

    size_i = clamp(c / (i+1), 2, max_turns) with c chosen so sizes sum to
    roughly ``n_turns`` (harmonic-number normalization, computed driver-side —
    scalar math only).
    """
    harmonic = math.log(n_convs) + 0.5772 if n_convs > 1 else 1.0
    c = max(2.0, n_turns / harmonic)
    return F.least(
        F.lit(max_turns),
        F.greatest(F.lit(2), F.ceil(F.lit(c) / (F.col("conv_idx") + 1)).cast("int")),
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    n_turns: int = 5_000,
    seed: int = 42,
    max_turns: int = 100_000,
    shuffle_rows: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript table; same (spark, args) → same rows."""
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731

    convs = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv_idx")
        .withColumn("conv_size", _zipf_sizes_expr(n_convs, n_turns, max_turns))
        .withColumn("conv_id", F.format_string("conv%06d", F.col("conv_idx")))
        # Seeded conversation start: spread over ~30 days from EPOCH_START.
        .withColumn(
            "conv_start_s",
            F.unix_timestamp(F.lit(EPOCH_START))
            + F.pmod(h(F.col("conv_id")), F.lit(86400 * 30)),
        )
    )
    if num_partitions:
        convs = convs.repartition(num_partitions, "conv_id")

    turns = convs.select(
        "conv_id",
        "conv_start_s",
        F.explode(F.sequence(F.lit(0), F.col("conv_size") - 1)).alias("turn_idx"),
    )

    th = h(F.col("conv_id"), F.col("turn_idx"))
    # Inter-turn gap: 1..120 s base; ~2% of turns open a >2h hole, ~0.5% a
    # >2d hole. turn 0 has gap 0 (conversation starts at conv_start_s).
    gap = (
        F.when(F.col("turn_idx") == 0, F.lit(0))
        .when(F.pmod(th, F.lit(200)) == 0, F.lit(2 * 86400 + 17))
        .when(F.pmod(th, F.lit(50)) == 0, F.lit(2 * 3600 + 5))
        .otherwise(F.lit(1) + F.pmod(th, F.lit(120)))
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        # Mostly user/assistant alternation with seeded system/tool injections.
        F.when(F.pmod(th, F.lit(11)) == 0, F.lit(3))
        .when(F.pmod(th, F.lit(13)) == 0, F.lit(4))
        .otherwise(F.pmod(F.col("turn_idx"), F.lit(2)).cast("int") + 1),
    )
    out = (
        turns.withColumn("gap_s", gap)
        .withColumn("ts", F.timestamp_seconds(F.col("conv_start_s") + F.sum("gap_s").over(w)))
        .withColumn("role", role)
        .withColumn(
            "text",
            F.concat_ws(
                ":",
                F.col("conv_id"),
                F.col("turn_idx").cast("string"),
                F.hex(th),
                # Variable-length tail so value=len(text) has spread.
                F.repeat(F.lit("x"), F.pmod(th, F.lit(180)).cast("int")),
            ),
        )
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                F.element_at(
                    F.array(F.lit("search"), F.lit("exec"), F.lit("browse")),
                    F.pmod(th, F.lit(3)).cast("int") + 1,
                ),
            ),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )
    if shuffle_rows:
        # Emit rows out of order so downstream code must prove stable
        # (conv_id, turn_idx) re-sort (FIXTURES.md §1 / SURVEY.md O1).
        out = out.orderBy(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 1)))
    return out


def with_value(df: DataFrame) -> DataFrame:
    """Derived numeric series per turn: value = length(text) as double.

    Feeds sum/avg/min/max rollups and Gorilla value encoding (FIXTURES.md §1).
    """
    return df.withColumn("value", F.length("text").cast("double"))
