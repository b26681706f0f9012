"""Continuous-aggregate tier rollups: raw turns → 1m → 1h → 1d.

Reference analog: grouped transform aggregation per cycle/unit
(``/root/reference/mpnsm/time_series/utils.py:93-129``) and frequency-tier
parameterization (``mpnsm/time_series/__init__.py:3-11``) — re-expressed as
Spark hash aggregations (partial + final, whole-stage codegen; no UDFs).

Every tier column is *associative*: higher tiers are exact re-aggregations of
the tier below (1h from 1m, 1d from 1h), and the identical ``_combine``
expressions re-merge partial aggregates of a hot conversation split by time
range (SURVEY.md §4 skew note). This is what makes the cascade and the skew
split safe at 10^12-turn scale: the expensive raw scan happens exactly once,
for the 1m tier.

Scale notes (100 TB): the raw→1m groupBy shuffles on (conv_id, bucket) — high
cardinality, naturally balanced because a conversation's turns spread over
many minute buckets; map-side partial aggregation collapses duplicate-minute
bursts before the shuffle. The cascades shuffle the (much smaller) tier
tables only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpnsm_spark import TIER_PARENT, TIER_TRUNC


def _role_count(role: str):
    return F.sum(F.when(F.col("role") == role, 1).otherwise(0)).alias(f"n_{role}")


def rollup_raw(df: DataFrame, tier: str = "1m") -> DataFrame:
    """Aggregate raw turns into a tier table.

    ``df`` must have (conv_id, turn_idx, role, tool, ts, value). Ordering of
    the input is irrelevant: first/last semantics bind to ``turn_idx`` (the
    stable per-row order key, SURVEY.md O1) via min_by/max_by, not to row
    arrival order — so the shuffled generator output aggregates identically.
    """
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_start")
    return (
        df.groupBy(F.col("conv_id"), bucket)
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
            _role_count("user"),
            _role_count("assistant"),
            _role_count("system"),
            _role_count("tool"),
            F.array_sort(F.collect_set("tool")).alias("tools"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.min_by("value", "turn_idx").alias("first_value"),
            F.max_by("value", "turn_idx").alias("last_value"),
        )
        .withColumn("distinct_tools", F.size("tools"))
        .withColumn("value_avg", F.col("value_sum") / F.col("turn_count"))
        .select(
            "conv_id",
            "bucket_start",
            "turn_count",
            "first_turn_idx",
            "last_turn_idx",
            "n_user",
            "n_assistant",
            "n_system",
            "n_tool",
            "tools",
            "distinct_tools",
            "value_sum",
            "value_min",
            "value_max",
            "value_avg",
            "first_value",
            "last_value",
        )
    )


def _combine(grouped) -> DataFrame:
    """Associative combine of tier rows — used by cascade AND skew re-merge."""
    return (
        grouped.agg(
            F.sum("turn_count").alias("turn_count"),
            F.min("first_turn_idx").alias("first_turn_idx"),
            F.max("last_turn_idx").alias("last_turn_idx"),
            F.sum("n_user").alias("n_user"),
            F.sum("n_assistant").alias("n_assistant"),
            F.sum("n_system").alias("n_system"),
            F.sum("n_tool").alias("n_tool"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("tools")))).alias(
                "tools"
            ),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
            F.min_by("first_value", "first_turn_idx").alias("first_value"),
            F.max_by("last_value", "last_turn_idx").alias("last_value"),
        )
        .withColumn("distinct_tools", F.size("tools"))
        .withColumn("value_avg", F.col("value_sum") / F.col("turn_count"))
    )


def cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer tier into ``to_tier`` (1m→1h, 1h→1d).

    Exactly consistent with aggregating raw data directly (tier-consistency
    invariant, FIXTURES.md §2) because every column is associative.
    """
    assert to_tier in TIER_PARENT, f"no cascade parent defined for {to_tier}"
    bucket = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_start")).alias(
        "bucket_start"
    )
    out = _combine(tier_df.groupBy(F.col("conv_id"), bucket))
    return out.select(*[c for c in tier_df.columns])


def merge_partials(partial_df: DataFrame) -> DataFrame:
    """Re-merge partial tier rows for the same (conv_id, bucket_start).

    Used after hot-conversation time-range splitting: partial aggregates from
    the sub-splits are combined with the same associative expressions.
    """
    out = _combine(partial_df.groupBy("conv_id", "bucket_start"))
    return out.select(*[c for c in partial_df.columns])


def rollup_tiers(raw_df: DataFrame) -> dict[str, DataFrame]:
    """Full cascade: raw → {'1m','1h','1d'} tier DataFrames (lazy)."""
    t1m = rollup_raw(raw_df, "1m")
    t1h = cascade(t1m, "1h")
    t1d = cascade(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}
