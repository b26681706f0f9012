"""End-to-end tier-materialization pipeline: resumable, lineage-tracked.

Pipeline: normalize (dedupe keep-last, stable order semantics) → 1m/1h/1d
tier cascade → gap-fill → Gorilla chunks → retention drop of raw turns —
committed per salt-bucket *wave* with per-bucket lineage rows, resumable by
anti-joining completed buckets.

Resume semantics follow the reference's incremental cache
(``/root/reference/mpnsm/time_series/deprecated/ts_manager.py:123-145,
276-284``): previously-completed work is detected (lineage rows ≡ the
``cache_feat`` flags), skipped (anti-join, J5), and outputs merged with
keep-last dedupe (U2). Versioned lineage rows are the analog of the versioned
``*_v{N}.json`` params artifacts (``manager.py:59-96``).

Crash-safety model with the parquet+manifest TableIO: data appends are atomic
at snapshot granularity (manifest renamed last); lineage is appended *after*
the stage's data. A crash between the two re-runs those buckets on resume,
which can only produce duplicate identical rows — removed by the read-side
keep-last dedupe in :func:`read_tier` / :func:`read_chunks` (with real
Iceberg this becomes MERGE INTO). Retention drops raw turns only after every
tier/chunk stage is lineage-complete AND the per-turn text-equality invariant
verifies (BASELINE.json ``input_hint``).

Scale notes (100 TB): the wave loop is over salt buckets (driver-side list of
ints, not data); each wave is one declarative Spark job over
``bucket_id IN (...)`` — partition pruning applies when raw is stored
bucket-partitioned. Stage outputs are tiny relative to raw (tier tables are
≥60× smaller at 1m, chunks are compressed blobs). The only full raw scans are
normalize and tier-1m; 1h/1d cascade from 1m.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mpnsm_spark import TIERS
from mpnsm_spark.generator import with_value
from mpnsm_spark.operators.gapfill import gapfill
from mpnsm_spark.operators.gorilla import encode_tier_chunks
from mpnsm_spark.operators.rollup import cascade, rollup_raw
from mpnsm_spark.operators.skew import with_salt
from mpnsm_spark.schema import LINEAGE_SCHEMA
from mpnsm_spark.sources.tableio import TableIO

LINEAGE_TABLE = "lineage"


@dataclass
class PipelineConfig:
    num_buckets: int = 16
    wave_size: int | None = None  # buckets per commit wave; None = all at once
    points_per_chunk: int = 4096
    gapfill_tiers: tuple[str, ...] = ("1h", "1d")
    retention_cutoff: str | None = None  # drop raw turns with ts < cutoff
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])


# ------------------------------------------------------------------ normalize


def normalize(raw_df: DataFrame, num_buckets: int) -> DataFrame:
    """Standardize raw turns: derived value column, salt bucket, keep-last
    dedupe on (conv_id, turn_idx).

    Keep-last = latest ``ts`` wins (reference: concat + drop_duplicates
    keep='last', ``deprecated/ts_manager.py:283-284``), implemented as a
    row_number window (SURVEY.md W12). Stable (conv_id, turn_idx) ordering is
    re-established by every downstream consumer via min_by/max_by or explicit
    sort — arrival order is never trusted (O1 invariant).
    """
    df = with_value(raw_df) if "value" not in raw_df.columns else raw_df
    df = with_salt(df, num_buckets)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("ts").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------------------- lineage


def completed_buckets(spark: SparkSession, io: TableIO, stage: str) -> set[int]:
    if not io.exists(LINEAGE_TABLE):
        return set()
    rows = (
        io.read(spark, LINEAGE_TABLE)
        .filter((F.col("stage") == stage) & (F.col("status") == "ok"))
        .select("bucket_id")
        .distinct()
        .collect()
    )
    return {r.bucket_id for r in rows}


def _lineage_rows(
    spark: SparkSession,
    cfg: PipelineConfig,
    stage: str,
    per_bucket: DataFrame,
    wall_seconds: float,
    version: int,
) -> DataFrame:
    pdf = per_bucket.toPandas()
    n = max(len(pdf), 1)
    rows = [
        (
            cfg.run_id,
            stage,
            int(r.bucket_id),
            int(getattr(r, "input_rows", 0)),
            int(getattr(r, "output_rows", 0)),
            int(getattr(r, "encode_bytes", 0)),
            float(wall_seconds / n),
            "ok",
            version,
        )
        for r in pdf.itertuples(index=False)
    ]
    return spark.createDataFrame(rows, LINEAGE_SCHEMA)


# ---------------------------------------------------------------- read helpers


def read_tier(spark: SparkSession, io: TableIO, tier: str) -> DataFrame:
    """Tier table with keep-last dedupe (U2 cache-merge semantics)."""
    w = Window.partitionBy("conv_id", "bucket_start").orderBy(F.col("_v").desc())
    return (
        io.read(spark, f"tier_{tier}")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_v", "bucket_id")
    )


def read_chunks(spark: SparkSession, io: TableIO, tier: str) -> DataFrame:
    w = Window.partitionBy("conv_id", "chunk_id").orderBy(F.col("_v").desc())
    return (
        io.read(spark, f"chunks_{tier}")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_v", "bucket_id")
    )


def read_gapfill(spark: SparkSession, io: TableIO, tier: str) -> DataFrame:
    w = Window.partitionBy("conv_id", "bucket_start").orderBy(F.col("_v").desc())
    return (
        io.read(spark, f"gapfill_{tier}")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_v", "bucket_id")
    )


def read_raw_retained(spark: SparkSession, io: TableIO) -> DataFrame:
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("_v").desc())
    return (
        io.read(spark, "raw_retained")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_v", "bucket_id")
    )


# ------------------------------------------------------------------ integrity


def verify_turn_integrity(
    spark: SparkSession, io: TableIO, reference_df: DataFrame
) -> bool:
    """Per-turn text equality under stable (conv_id, turn_idx) ordering.

    Compares an order-insensitive per-conversation checksum of
    (turn_idx, text) between the normalized reference rows and the stored
    raw_retained table — cheap (two aggregations + a join on conv_id, no wide
    text shuffle)."""
    stored = read_raw_retained(spark, io)

    def checksum(df: DataFrame) -> DataFrame:
        # bit_xor is commutative/associative and overflow-free under ANSI mode;
        # (conv_id, turn_idx) is unique post-dedupe so pairwise cancellation
        # of identical rows cannot occur.
        return df.groupBy("conv_id").agg(
            F.bit_xor(F.xxhash64("turn_idx", "text")).alias("chk"),
            F.count(F.lit(1)).alias("n"),
        )

    bad = (
        checksum(reference_df)
        .alias("r")
        .join(checksum(stored).alias("g"), "conv_id", "full")
        .filter(
            F.col("r.chk").isNull()
            | F.col("g.chk").isNull()
            | (F.col("r.chk") != F.col("g.chk"))
            | (F.col("r.n") != F.col("g.n"))
        )
    )
    return bad.limit(1).count() == 0


# -------------------------------------------------------------------- pipeline


class StageFailure(RuntimeError):
    pass


def run_pipeline(
    spark: SparkSession,
    raw_df: DataFrame,
    io: TableIO,
    cfg: PipelineConfig | None = None,
    fail_after_stage: str | None = None,
) -> dict:
    """Run (or resume) the full tier-materialization pipeline.

    Returns a summary dict (per-stage bucket counts, wall time, throughput).
    ``fail_after_stage`` injects a crash after that stage's first wave commits
    — used by the kill/resume idempotence tests.
    """
    cfg = cfg or PipelineConfig()
    t_start = time.time()
    norm = normalize(raw_df, cfg.num_buckets).cache()
    input_turns = norm.count()

    stages_run: dict[str, list[int]] = {}

    def waves(remaining: list[int]) -> list[list[int]]:
        if not remaining:
            return []
        size = cfg.wave_size or len(remaining)
        return [remaining[i : i + size] for i in range(0, len(remaining), size)]

    def run_stage(stage: str, produce, count_cols=None) -> None:
        """produce(bucket_subset_df_or_ids) -> output DataFrame with bucket_id."""
        done = completed_buckets(spark, io, stage)
        remaining = sorted(set(range(cfg.num_buckets)) - done)
        stages_run[stage] = remaining
        for wave in waves(remaining):
            t0 = time.time()
            out = produce(wave).withColumn(
                "_v", F.lit(io.snapshot_version(stage_table(stage)) + 1)
            )
            out = out.cache()
            stats = out.groupBy("bucket_id").agg(
                F.count(F.lit(1)).alias("output_rows"),
                *(
                    [F.sum(F.length("ts_blob") + F.length("value_blob")).alias("encode_bytes")]
                    if stage.startswith("chunks_")
                    else []
                ),
            )
            # Buckets that produced zero rows still need lineage rows.
            all_ids = spark.createDataFrame(
                [(int(b),) for b in wave], "bucket_id int"
            )
            stats = all_ids.join(stats, "bucket_id", "left").na.fill(0)
            version = io.append(out, stage_table(stage), meta={"stage": stage, "buckets": wave})
            io.append(
                _lineage_rows(spark, cfg, stage, stats, time.time() - t0, version),
                LINEAGE_TABLE,
            )
            out.unpersist()
            if fail_after_stage == stage:
                raise StageFailure(f"injected failure after stage {stage}")

    def stage_table(stage: str) -> str:
        return stage if not stage.startswith("retention") else "raw_retained"

    # --- tier cascade ---------------------------------------------------
    def produce_1m(wave):
        sub = norm.filter(F.col("bucket_id").isin([int(b) for b in wave]))
        out = rollup_raw(sub, "1m")
        return with_salt(out, cfg.num_buckets)

    run_stage("tier_1m", produce_1m)

    for tier in ("1h", "1d"):
        parent = {"1h": "1m", "1d": "1h"}[tier]

        def produce_cascade(wave, _parent=parent, _tier=tier):
            src = read_tier(spark, io, _parent)
            src = with_salt(src, cfg.num_buckets).filter(
                F.col("bucket_id").isin([int(b) for b in wave])
            ).drop("bucket_id")
            return with_salt(cascade(src, _tier), cfg.num_buckets)

        run_stage(f"tier_{tier}", produce_cascade)

    # --- gap-fill ---------------------------------------------------------
    for tier in cfg.gapfill_tiers:

        def produce_gapfill(wave, _tier=tier):
            src = with_salt(read_tier(spark, io, _tier), cfg.num_buckets)
            src = src.filter(F.col("bucket_id").isin([int(b) for b in wave])).drop(
                "bucket_id"
            )
            return with_salt(gapfill(src, _tier), cfg.num_buckets)

        run_stage(f"gapfill_{tier}", produce_gapfill)

    # --- Gorilla chunks -----------------------------------------------------
    for tier in TIERS:

        def produce_chunks(wave, _tier=tier):
            src = with_salt(read_tier(spark, io, _tier), cfg.num_buckets)
            src = src.filter(F.col("bucket_id").isin([int(b) for b in wave])).drop(
                "bucket_id"
            )
            out = encode_tier_chunks(src, _tier, points_per_chunk=cfg.points_per_chunk)
            return with_salt(out, cfg.num_buckets)

        run_stage(f"chunks_{tier}", produce_chunks)

    # --- retention ----------------------------------------------------------
    def produce_retention(wave):
        sub = norm.filter(F.col("bucket_id").isin([int(b) for b in wave]))
        if cfg.retention_cutoff:
            sub = sub.filter(F.col("ts") >= F.lit(cfg.retention_cutoff))
        return sub

    run_stage("retention", produce_retention)

    ok = verify_turn_integrity(
        spark,
        io,
        norm.filter(F.col("ts") >= F.lit(cfg.retention_cutoff))
        if cfg.retention_cutoff
        else norm,
    )
    if not ok:
        raise StageFailure("per-turn text integrity check failed — raw NOT droppable")

    wall = time.time() - t_start
    norm.unpersist()
    return {
        "run_id": cfg.run_id,
        "input_turns": input_turns,
        "wall_seconds": wall,
        "turns_per_sec": input_turns / wall if wall > 0 else 0.0,
        "stages": {k: len(v) for k, v in stages_run.items()},
        "integrity_ok": ok,
    }
