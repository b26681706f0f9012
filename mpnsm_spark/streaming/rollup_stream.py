"""Structured Streaming tier rollup — incremental continuous aggregates.

The reference is strictly batch (SURVEY.md §2.9), but the engine's tier
rollups are directly expressible as streaming tumbling-window aggregations:
``groupBy(conv_id, window(ts, tier))`` with a watermark bounding how late a
turn may arrive. This module provides that surface for incremental arrival:

- late/out-of-order turns within the watermark update their bucket exactly
  like the batch rollup (the aggregation state is keyed on (conv, window));
- ``first/last by turn_idx`` is maintained with min_by/max_by — arrival-order
  independent, matching batch semantics;
- the sink is ``foreachBatch`` → TableIO append, so tier snapshots and
  lineage stay on the same storage path as the batch pipeline.

Streaming consistency contract (tested): for any finite input replayed as a
stream, the streaming tier table equals the batch ``rollup_raw`` of the same
rows, provided no row is later than the watermark.

Scale notes: state size = open windows × conversations with traffic in them;
the watermark bounds window lifetime so state is O(active convs × lateness /
tier). Use the 1m tier streaming and cascade 1h/1d in batch from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpnsm_spark.operators.rollup import (
    _combine,
    rollup_raw,
    tool_mask_expr,
    tools_from_mask,
)

_TIER_COLS = (
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


def _windowed_1m(
    stream_df: DataFrame,
    watermark: str,
    tool_vocab: list[str] | None,
) -> DataFrame:
    """1m streaming aggregation keeping the ``win`` window struct (the
    cascade re-windows on it; :func:`streaming_rollup_1m` projects it away)."""
    w = F.window("ts", "1 minute")
    base = stream_df.withWatermark("ts", watermark)

    def role_count(role: str):
        return F.sum(F.when(F.col("role") == role, 1).otherwise(0)).alias(f"n_{role}")

    tool_aggs = (
        [F.bit_or(tool_mask_expr(F.col("tool"), tool_vocab)).alias("tools_mask")]
        if tool_vocab is not None
        else [F.array_sort(F.collect_set("tool")).alias("tools")]
    )
    out = base.groupBy(F.col("conv_id"), w.alias("win")).agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.min("turn_idx").alias("first_turn_idx"),
        F.max("turn_idx").alias("last_turn_idx"),
        role_count("user"),
        role_count("assistant"),
        role_count("system"),
        role_count("tool"),
        *tool_aggs,
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min_by("value", "turn_idx").alias("first_value"),
        F.max_by("value", "turn_idx").alias("last_value"),
    )
    mask_cols = []
    if tool_vocab is not None:
        out = out.withColumn(
            "tools", tools_from_mask(F.col("tools_mask"), tool_vocab)
        ).withColumn("distinct_tools", F.bit_count("tools_mask").cast("int"))
        mask_cols = ["tools_mask"]
    else:
        out = out.withColumn("distinct_tools", F.size("tools"))
    return out.withColumn(
        "value_avg", F.col("value_sum") / F.col("turn_count")
    ).select("conv_id", "win", *_TIER_COLS, *mask_cols)


def streaming_rollup_1m(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    tool_vocab: list[str] | None = None,
) -> DataFrame:
    """Streaming 1m tier aggregation (append mode once the watermark passes).

    ``stream_df`` must be a streaming DataFrame with the transcript schema
    plus ``value``. Output schema matches the batch tier table. Pass
    ``tool_vocab`` so the distinct-tool set aggregates as a fixed-width
    ``bit_or`` bitmask (same dictionary as the batch pipeline — streaming
    can't scan its own input for a vocabulary); without it the state store
    falls back to collect_set and the ``tools_mask`` column is omitted.
    """
    out = _windowed_1m(stream_df, watermark, tool_vocab)
    return out.select(
        "conv_id",
        F.col("win.start").alias("bucket_start"),
        *[c for c in out.columns if c not in ("conv_id", "win")],
    )


_CASCADE_DUR = {"1h": "1 hour", "1d": "1 day"}
_CASCADE_PARENT = {"1h": "1m", "1d": "1h"}


def streaming_cascade(
    stream_df: DataFrame,
    to_tier: str = "1d",
    watermark: str = "10 minutes",
    tool_vocab: list[str] | None = None,
) -> DataFrame:
    """The full 1m→1h(→1d) tier cascade as ONE watermark-correct streaming
    job (chained stateful window aggregations, Spark 3.4+ multiple-stateful-
    operator support).

    Each stage re-windows the previous tier's window struct on its event
    time (``window(window_time(win), parent_duration)``) and combines with
    the SAME associative expressions as the batch :func:`~mpnsm_spark.
    operators.rollup.cascade` (``_combine``), so the streaming output is
    row-identical to cascading the batch tiers — the tier-consistency
    invariant (FIXTURES.md §2) extends to streaming. Watermark semantics
    chain naturally: a 1m window finalizes when the source watermark passes
    its end; a 1h window finalizes when every child 1m window has finalized;
    likewise 1d — so append mode emits each coarse bucket exactly once, only
    when it can no longer change.

    ``tool_vocab`` is REQUIRED: the distinct-tool union must ride a
    fixed-width ``bit_or`` mask through every stage — per-stage collect_set
    state is unbounded and non-associative across re-windows.

    Scale notes: state is (convs with open windows) rows per stage; the 1h
    and 1d stages see ~60× / ~1440× fewer input rows than the source, so the
    cascade's marginal state and shuffle are a rounding error on the 1m
    stage. Reference analog: none (the reference is batch-only,
    SURVEY.md §2.9); batch twin is operators/rollup.py ``rollup_tiers``.
    """
    if to_tier not in _CASCADE_DUR:
        raise ValueError(f"to_tier must be one of {sorted(_CASCADE_DUR)}")
    if tool_vocab is None:
        raise ValueError("streaming_cascade requires tool_vocab (bit_or mask state)")
    tiers = ["1h"] if to_tier == "1h" else ["1h", "1d"]
    agg = _windowed_1m(stream_df, watermark, tool_vocab)
    for tier in tiers:
        grouped = agg.groupBy(
            "conv_id",
            F.window(F.window_time("win"), _CASCADE_DUR[tier]).alias("win"),
        )
        agg = _combine(grouped, tool_vocab, tools_arrays=False).select(
            "conv_id", "win", *_TIER_COLS, "tools_mask"
        )
    return agg.select(
        "conv_id", F.col("win.start").alias("bucket_start"), *_TIER_COLS, "tools_mask"
    )


def run_cascade_to_memory(
    spark,
    stream_df: DataFrame,
    to_tier: str = "1d",
    tool_vocab: list[str] | None = None,
    watermark: str = "10 minutes",
    query_name: str = "tier_cascade_stream",
) -> DataFrame:
    """Drive a finite source through the chained cascade and return the
    materialized result (test harness).

    Chained stateful aggregations forbid ``complete`` mode, so this runs
    APPEND mode: only watermark-finalized buckets emit. Finite replays must
    therefore ship a flush sentinel (a row far enough in the future to close
    every real window — the caller filters it out); without one the final
    open buckets are absent by design.
    """
    agg = streaming_cascade(
        stream_df, to_tier=to_tier, watermark=watermark, tool_vocab=tool_vocab
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_to_memory(
    spark,
    stream_df: DataFrame,
    query_name: str = "tier_1m_stream",
    tool_vocab: list[str] | None = None,
) -> DataFrame:
    """Drive a finite source to completion through the streaming rollup and
    return the materialized result (test/verification harness).

    ``complete`` output mode: every trigger rewrites the full aggregate state,
    so the memory table holds the final tier rows even for buckets whose
    watermark never expired (finite replay).
    """
    agg = streaming_rollup_1m(stream_df, tool_vocab=tool_vocab)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_to_tableio(
    spark,
    stream_df: DataFrame,
    io,
    table: str = "tier_1m",
    watermark: str = "10 minutes",
    tool_vocab: list[str] | None = None,
    checkpoint_dir: str | None = None,
    num_buckets: int = 16,
    run_id: str = "stream",
):
    """Production streaming sink: append-mode (only watermark-FINALIZED
    windows emit) through ``foreachBatch`` into the same TableIO commit path
    as the batch pipeline — one snapshot + one lineage append per micro-batch,
    so ``read_tier`` and the resume machinery see streaming output
    identically to batch output.

    Exactly-once story: the checkpoint replays an uncommitted micro-batch
    after a crash; the replayed append writes identical rows at a higher
    snapshot version and :func:`read_stream_tier` keeps one copy per
    (conv_id, bucket_start) — the same crash-between-data-and-lineage
    contract as the batch stages (append mode emits each finalized window
    exactly once, so non-replay snapshots never overlap).

    Returns the configured DataStreamWriter — the caller picks the trigger
    (``.trigger(availableNow=True).start()`` for finite replay, processing-
    time triggers for continuous ingestion) and owns await/stop.
    """
    import time as _time

    from mpnsm_spark.operators.skew import with_salt

    agg = with_salt(
        streaming_rollup_1m(stream_df, watermark=watermark, tool_vocab=tool_vocab),
        num_buckets,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = _time.time()
        out = batch_df.withColumn(
            "_v", F.lit(io.snapshot_version(table) + 1)
        ).cache()
        try:
            version = io.append(
                out, table, meta={"stream_batch": int(batch_id)}
            )
            stats = out.groupBy("bucket_id").agg(
                F.count(F.lit(1)).alias("output_rows"),
                F.sum("turn_count").alias("input_rows"),
            )
            lineage = stats.select(
                F.lit(run_id).alias("run_id"),
                F.lit(f"stream_{table}").alias("stage"),
                F.col("bucket_id").cast("int").alias("bucket_id"),
                F.col("input_rows").cast("long").alias("input_rows"),
                F.col("output_rows").cast("long").alias("output_rows"),
                F.lit(0).cast("long").alias("encode_bytes"),
                F.lit(float(_time.time() - t0)).alias("wall_seconds"),
                F.lit("ok").alias("status"),
                F.lit(version).cast("int").alias("version"),
            )
            io.append(lineage.coalesce(1), "lineage")
        finally:
            out.unpersist()

    writer = agg.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_stream_tier(spark, io, table: str = "tier_1m") -> DataFrame:
    """Read a streaming-appended tier table. The batch reader's snapshot
    dedupe is BUCKET-granular (a batch stage writes a bucket atomically);
    streaming appends a bucket's windows across many micro-batches, so the
    dedupe unit here is the window itself: per (conv_id, bucket_start) keep
    the highest snapshot version (checkpoint-replay duplicates are identical
    rows at a higher ``_v``)."""
    df = io.read(spark, table)
    others = [c for c in df.columns if c not in ("conv_id", "bucket_start")]
    out = df.groupBy("conv_id", "bucket_start").agg(
        F.max_by(F.struct(*others), F.col("_v")).alias("_r")
    )
    return out.select(
        "conv_id", "bucket_start", *[F.col(f"_r.{c}").alias(c) for c in others]
    ).drop("_v", "bucket_id")


def batch_equivalent(
    raw_df: DataFrame, tool_vocab: list[str] | None = None
) -> DataFrame:
    """The batch query a finite streaming replay must equal (consistency
    oracle)."""
    out = rollup_raw(raw_df, "1m", tool_vocab)
    return out if tool_vocab is not None else out.drop("tools_mask")
