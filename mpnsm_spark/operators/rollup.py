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

Scale notes (100 TB):

- The raw→1m groupBy shuffles on (conv_id, bucket) — high cardinality,
  naturally balanced; map-side partial aggregation collapses duplicate-minute
  bursts before the shuffle. The cascades shuffle the (much smaller) tier
  tables only — or nothing at all when the input is already hash-partitioned
  by ``conv_id`` (subset-of-grouping-keys rule), which is how the pipeline
  runs the whole cascade behind ONE exchange.
- **Every aggregate is fixed-width** so the whole tier path stays in
  Tungsten ``HashAggregateExec`` (codegen, UnsafeRow hash map, graceful
  spill). The distinct-tool set is a ``bit_or`` BITMASK over a small
  dictionary (``tool_vocab``), not ``collect_set``: object-hash aggregation
  falls back to sort-based execution past 128 map entries and allocates a
  set buffer per group — measured 2-3× slower and GC-bound at 5M+ groups.
  The human-readable ``tools`` array is decoded from the mask by a pure
  projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mpnsm_spark import TIER_PARENT, TIER_TRUNC

MAX_TOOL_VOCAB = 62  # bitmask bits in a signed long, minus sign-bit headroom


def distinct_tool_vocab(df: DataFrame, tool_col: str = "tool") -> list[str]:
    """Sorted distinct non-null tool names — the bitmask dictionary.

    One column-pruned scan with map-side partial distinct; the low-cardinality
    combiner reduces each task to vocab size before the (tiny) shuffle.
    """
    rows = (
        df.select(tool_col).where(F.col(tool_col).isNotNull()).distinct().collect()
    )
    return sorted(r[0] for r in rows)


def tool_mask_expr(tool: Column, tool_vocab: list[str]) -> Column:
    """Per-row tool bit: ``1 << index_in_vocab`` (0 for null/unknown)."""
    expr = F.when(tool.isNull(), F.lit(0).cast("long"))
    for i, v in enumerate(tool_vocab):
        expr = expr.when(tool == v, F.lit(1 << i).cast("long"))
    return expr.otherwise(F.lit(0).cast("long"))


def tools_from_mask(mask: Column, tool_vocab: list[str]) -> Column:
    """Decode a bitmask back to the sorted tool-name array (pure projection).

    Bit ``i`` means ``tool_vocab[i]`` AS GIVEN — the encoder assigns tool ids
    by vocab list position, and with append-only cross-run vocabs
    (pipeline.reconcile_tool_vocab) the list is NOT globally sorted; only the
    decoded output array is sorted for stable presentation."""
    slots = [
        F.when(mask.bitwiseAND(F.lit(1 << i).cast("long")) != 0, F.lit(v))
        for i, v in enumerate(tool_vocab)
    ] or [F.lit(None).cast("string")]
    return F.array_sort(F.array_compact(F.array(*slots)))


TIER_COLUMNS = [
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
    "tools_mask",
]


# What the pipeline STORES/CACHES: `tools` (array<string>) and
# `distinct_tools` are pure projections of `tools_mask` + the vocab, so
# persisting them only bloats every tier write/cache (the array column is the
# single widest tier field at ~17M rows per 20M turns). `decode_tier` /
# `read_tier` reconstruct them losslessly on read.
TIER_COLUMNS_STORED = [c for c in TIER_COLUMNS if c not in ("tools", "distinct_tools")]


def decode_tier(df: DataFrame, tool_vocab: list[str]) -> DataFrame:
    """Reconstruct the derived tools/distinct_tools columns from the mask."""
    return df.withColumns(
        {
            "tools": tools_from_mask(F.col("tools_mask"), tool_vocab),
            "distinct_tools": F.bit_count("tools_mask").cast("int"),
        }
    ).select(*TIER_COLUMNS, *[c for c in df.columns if c not in TIER_COLUMNS])


def _finish_tier(
    grouped: DataFrame, tool_vocab: list[str], decode_tools: bool = True
) -> DataFrame:
    out = grouped.withColumn(
        "value_avg", F.col("value_sum") / F.col("turn_count")
    )
    if not decode_tools:
        return out.select(*TIER_COLUMNS_STORED)
    return (
        out.withColumn("tools", tools_from_mask(F.col("tools_mask"), tool_vocab))
        .withColumn("distinct_tools", F.bit_count("tools_mask").cast("int"))
        .select(*TIER_COLUMNS)
    )


def rollup_raw(
    df: DataFrame, tier: str = "1m", tool_vocab: list[str] | None = None
) -> DataFrame:
    """Aggregate raw turns into a tier table.

    ``df`` must have (conv_id, turn_idx, role, tool, ts, value). Ordering of
    the input is irrelevant: first/last semantics bind to ``turn_idx`` (the
    stable per-row order key, SURVEY.md O1) via min_by/max_by, not to row
    arrival order — so the shuffled generator output aggregates identically.

    ``tool_vocab``: bitmask dictionary (sorted distinct tools). Auto-computed
    with one tiny job when omitted; pass it explicitly in pipelines so the
    scan happens once.
    """
    if tool_vocab is None:
        tool_vocab = distinct_tool_vocab(df)
    if len(tool_vocab) > MAX_TOOL_VOCAB:
        raise ValueError(
            f"tool vocabulary {len(tool_vocab)} exceeds {MAX_TOOL_VOCAB} bitmask "
            "slots — shard the mask into multiple longs or dictionary-page it"
        )
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_start")

    def role_count(role: str) -> Column:
        return F.sum(F.when(F.col("role") == role, 1).otherwise(0)).alias(f"n_{role}")

    grouped = df.groupBy(F.col("conv_id"), bucket).agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.min("turn_idx").alias("first_turn_idx"),
        F.max("turn_idx").alias("last_turn_idx"),
        role_count("user"),
        role_count("assistant"),
        role_count("system"),
        role_count("tool"),
        F.bit_or(tool_mask_expr(F.col("tool"), tool_vocab)).alias("tools_mask"),
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min_by("value", "turn_idx").alias("first_value"),
        F.max_by("value", "turn_idx").alias("last_value"),
    )
    return _finish_tier(grouped, tool_vocab)


def rollup_encoded(
    norm: DataFrame,
    tier: str,
    role_vocab: list[str],
    tool_vocab: list[str],
    decode_tools: bool = True,
) -> DataFrame:
    """rollup_raw twin over dictionary-encoded input (role_id/tool_id ints,
    see ``pipeline.encode_role_tool``) — the pipeline's hot path: every
    expression is int/long/double, so partial+final aggregation is pure
    whole-stage-codegen HashAggregate with zero string comparisons per row."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_start")
    ridx = {r: i for i, r in enumerate(role_vocab)}

    def role_count(role: str) -> Column:
        return F.sum(
            F.when(F.col("role_id") == ridx.get(role, -2), 1).otherwise(0)
        ).alias(f"n_{role}")

    mask = F.when(
        F.col("tool_id") >= 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), tool_id)"),
    ).otherwise(F.lit(0).cast("long"))
    grouped = norm.groupBy(F.col("conv_id"), bucket).agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.min("turn_idx").alias("first_turn_idx"),
        F.max("turn_idx").alias("last_turn_idx"),
        role_count("user"),
        role_count("assistant"),
        role_count("system"),
        role_count("tool"),
        F.bit_or(mask).alias("tools_mask"),
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min_by("value", "turn_idx").alias("first_value"),
        F.max_by("value", "turn_idx").alias("last_value"),
    )
    return _finish_tier(grouped, tool_vocab, decode_tools)


def _combine(grouped, tool_vocab: list[str] | None, tools_arrays: bool) -> DataFrame:
    """Associative combine of tier rows — used by cascade AND skew re-merge.

    The distinct-tool union is ``bit_or`` of masks (fixed-width). The name
    array is decoded from the combined mask when ``tool_vocab`` is given;
    otherwise (vocab-less small-data use) it falls back to flattening the
    child arrays — the only object aggregate left, off the pipeline path.
    """
    extra = (
        []
        if tool_vocab is not None or not tools_arrays
        else [
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("tools")))
            ).alias("tools")
        ]
    )
    out = grouped.agg(
        F.sum("turn_count").alias("turn_count"),
        F.min("first_turn_idx").alias("first_turn_idx"),
        F.max("last_turn_idx").alias("last_turn_idx"),
        F.sum("n_user").alias("n_user"),
        F.sum("n_assistant").alias("n_assistant"),
        F.sum("n_system").alias("n_system"),
        F.sum("n_tool").alias("n_tool"),
        F.bit_or("tools_mask").alias("tools_mask"),
        F.sum("value_sum").alias("value_sum"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
        F.min_by("first_value", "first_turn_idx").alias("first_value"),
        F.max_by("last_value", "last_turn_idx").alias("last_value"),
        *extra,
    )
    if tool_vocab is not None:
        out = out.withColumn("tools", tools_from_mask(F.col("tools_mask"), tool_vocab))
    elif not tools_arrays:
        out = out.withColumn("tools", F.array_compact(F.array(F.lit(None).cast("string"))))
    return (
        out.withColumn("distinct_tools", F.bit_count("tools_mask").cast("int"))
        .withColumn("value_avg", F.col("value_sum") / F.col("turn_count"))
    )


def cascade(
    tier_df: DataFrame, to_tier: str, tool_vocab: list[str] | None = None
) -> DataFrame:
    """Re-aggregate a finer tier into ``to_tier`` (1m→1h, 1h→1d).

    Exactly consistent with aggregating raw data directly (tier-consistency
    invariant, FIXTURES.md §2) because every column is associative.
    """
    assert to_tier in TIER_PARENT, f"no cascade parent defined for {to_tier}"
    bucket = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_start")).alias(
        "bucket_start"
    )
    out = _combine(
        tier_df.groupBy(F.col("conv_id"), bucket),
        tool_vocab,
        tools_arrays="tools" in tier_df.columns,
    )
    return out.select(*[c for c in tier_df.columns])


def merge_partials(
    partial_df: DataFrame, tool_vocab: list[str] | None = None
) -> DataFrame:
    """Re-merge partial tier rows for the same (conv_id, bucket_start).

    Used after hot-conversation time-range splitting: partial aggregates from
    the sub-splits are combined with the same associative expressions.
    """
    out = _combine(
        partial_df.groupBy("conv_id", "bucket_start"),
        tool_vocab,
        tools_arrays="tools" in partial_df.columns,
    )
    return out.select(*[c for c in partial_df.columns])


def rollup_tiers(raw_df: DataFrame) -> dict[str, DataFrame]:
    """Full cascade: raw → {'1m','1h','1d'} tier DataFrames (lazy)."""
    vocab = distinct_tool_vocab(raw_df)
    t1m = rollup_raw(raw_df, "1m", vocab)
    t1h = cascade(t1m, "1h", vocab)
    t1d = cascade(t1h, "1d", vocab)
    return {"1m": t1m, "1h": t1h, "1d": t1d}
