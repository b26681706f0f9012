"""End-to-end pipeline: correctness, lineage, retention invariant, kill/resume."""

import pytest
from pyspark.sql import functions as F

from mpnsm_spark.operators.rollup import rollup_raw
from mpnsm_spark.plans.pipeline import (
    LINEAGE_TABLE,
    PipelineConfig,
    StageFailure,
    normalize,
    read_chunks,
    read_gapfill,
    read_raw_retained,
    read_tier,
    run_pipeline,
    verify_turn_integrity,
)
from mpnsm_spark.sources.tableio import TableIO

from .oracle_pandas import compare_frames

FLOATS = ("value_sum", "value_min", "value_max", "value_avg", "first_value", "last_value")
KEYS = ["conv_id", "bucket_start"]


def _cfg(**kw):
    defaults = dict(num_buckets=4, points_per_chunk=512, gapfill_tiers=("1d",))
    defaults.update(kw)
    return PipelineConfig(**defaults)


def test_pipeline_end_to_end(spark, transcripts, tmp_path):
    io = TableIO(str(tmp_path / "warehouse"))
    summary = run_pipeline(spark, transcripts, io, _cfg())
    assert summary["integrity_ok"]
    assert summary["input_turns"] == transcripts.count()

    # Tier tables match direct rollups of the normalized input.
    norm = normalize(transcripts, 4).drop("bucket_id")
    for tier in ("1m", "1h", "1d"):
        stored = read_tier(spark, io, tier).toPandas()
        direct = rollup_raw(norm, tier).toPandas()
        compare_frames(stored, direct, KEYS, float_cols=FLOATS)

    # Chunks decode back to tier points.
    from mpnsm_spark.operators.gorilla import decode_chunks

    dec = decode_chunks(read_chunks(spark, io, "1h")).count()
    assert dec == read_tier(spark, io, "1h").count()

    # Gap-fill table exists and is dense per conv.
    gf = read_gapfill(spark, io, "1d")
    assert gf.count() >= read_tier(spark, io, "1d").count()

    # Lineage: every stage has one ok row per bucket.
    lin = io.read(spark, LINEAGE_TABLE).toPandas()
    for stage in (
        "tier_1m",
        "tier_1h",
        "tier_1d",
        "gapfill_1d",
        "chunks_1m",
        "chunks_1h",
        "chunks_1d",
        "retention",
    ):
        got = lin[(lin.stage == stage) & (lin.status == "ok")].bucket_id.nunique()
        assert got == 4, f"stage {stage}: {got} buckets"
    # Chunk stages report encode_bytes.
    assert (lin[lin.stage == "chunks_1m"].encode_bytes > 0).all()


def test_retention_cutoff_drops_raw_but_keeps_tiers(spark, transcripts, tmp_path):
    io = TableIO(str(tmp_path / "wh2"))
    cutoff = "2025-01-15 00:00:00"
    summary = run_pipeline(spark, transcripts, io, _cfg(retention_cutoff=cutoff))
    assert summary["integrity_ok"]
    retained = read_raw_retained(spark, io)
    assert retained.filter(F.col("ts") < cutoff).count() == 0
    # Tiers still cover the dropped period (retention safety, FIXTURES.md).
    t1d = read_tier(spark, io, "1d")
    assert t1d.filter(F.col("bucket_start") < cutoff).count() > 0
    # All retained turns match the source text exactly.
    src = normalize(transcripts, 4).filter(F.col("ts") >= cutoff)
    joined = src.alias("s").join(
        retained.alias("r"), ["conv_id", "turn_idx"], "full"
    )
    mism = joined.filter(
        F.col("s.text").isNull()
        | F.col("r.text").isNull()
        | (F.col("s.text") != F.col("r.text"))
    )
    assert mism.count() == 0


def test_kill_resume_idempotent(spark, transcripts, tmp_path):
    """Crash after tier_1h commits → resume completes; outputs identical to a
    clean one-shot run (resume idempotence, SURVEY.md §5.3)."""
    io = TableIO(str(tmp_path / "wh3"))
    cfg = _cfg(wave_size=2)
    with pytest.raises(StageFailure):
        run_pipeline(spark, transcripts, io, cfg, fail_after_stage="tier_1h")
    lin = io.read(spark, LINEAGE_TABLE).toPandas()
    assert set(lin[lin.stage == "tier_1m"].bucket_id) == {0, 1, 2, 3}
    # tier_1h only got its first wave before the crash
    assert set(lin[lin.stage == "tier_1h"].bucket_id) == {0, 1}

    resumed = run_pipeline(spark, transcripts, io, _cfg(wave_size=2))
    assert resumed["integrity_ok"]
    # Resume skipped completed buckets.
    assert resumed["stages"]["tier_1m"] == 0
    assert resumed["stages"]["tier_1h"] == 2

    # Byte-identical tier content vs a clean run.
    io_clean = TableIO(str(tmp_path / "wh3_clean"))
    run_pipeline(spark, transcripts, io_clean, _cfg())
    for tier in ("1m", "1h", "1d"):
        a = read_tier(spark, io, tier).toPandas()
        b = read_tier(spark, io_clean, tier).toPandas()
        compare_frames(a, b, KEYS, float_cols=FLOATS)


def test_resume_noop_when_complete(spark, transcripts, tmp_path):
    io = TableIO(str(tmp_path / "wh4"))
    run_pipeline(spark, transcripts, io, _cfg())
    again = run_pipeline(spark, transcripts, io, _cfg())
    assert all(v == 0 for v in again["stages"].values())


def test_integrity_detects_corruption(spark, transcripts, tmp_path):
    io = TableIO(str(tmp_path / "wh5"))
    run_pipeline(spark, transcripts, io, _cfg())
    norm = normalize(transcripts, 4)
    tampered = norm.withColumn(
        "text", F.when(F.col("turn_idx") == 0, F.lit("TAMPERED")).otherwise(F.col("text"))
    )
    assert verify_turn_integrity(spark, io, norm)
    assert not verify_turn_integrity(spark, io, tampered)


def test_normalize_dedupes_keep_last(spark, transcripts):
    dup = transcripts.unionByName(
        transcripts.limit(50).withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")
        ).withColumn("text", F.lit("NEWER"))
    )
    norm = normalize(dup, 4)
    assert norm.count() == transcripts.count()
    assert norm.filter(F.col("text") == "NEWER").count() == 50


def test_dedupe_strict_ties_keeps_one_consistent_row(spark):
    """Tied-ts duplicates with differing payloads: strict_ties must keep ONE
    row (the lexicographic max over (ts, role_id, tool_id, value)), never a
    column-mixed frankenrow."""
    from mpnsm_spark.plans.pipeline import dedupe_encoded

    pre = spark.createDataFrame(
        [
            ("c", 1, "2025-01-01 00:00:00", 1, 9, 1.0),
            ("c", 1, "2025-01-01 00:00:00", 2, 0, 0.5),
        ],
        "conv_id string, turn_idx int, ts string, role_id int, tool_id int, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedupe_encoded(pre, strict_ties=True).collect()
    assert len(out) == 1
    r = out[0]
    # max struct: ts ties -> role_id 2 wins -> its full payload (0, 0.5)
    assert (r.role_id, r.tool_id, r.value) == (2, 0, 0.5)


def _tier_snap(spark, conv_id, tools_mask, bucket_id, v):
    """Minimal stored-schema tier snapshot (one row) for vocab tests."""
    from mpnsm_spark.operators.rollup import TIER_COLUMNS_STORED

    row = {
        "conv_id": conv_id,
        "bucket_start": "2025-01-01 00:00:00",
        "turn_count": 1,
        "first_turn_idx": 0,
        "last_turn_idx": 0,
        "n_user": 1,
        "n_assistant": 0,
        "n_system": 0,
        "n_tool": 0,
        "value_sum": 1.0,
        "value_min": 1.0,
        "value_max": 1.0,
        "value_avg": 1.0,
        "first_value": 1.0,
        "last_value": 1.0,
        "tools_mask": tools_mask,
        "bucket_id": bucket_id,
        "_v": v,
    }
    df = spark.createDataFrame([tuple(row.values())], list(row.keys()))
    df = df.withColumns(
        {
            "bucket_start": F.to_timestamp("bucket_start"),
            "tools_mask": F.col("tools_mask").cast("long"),
        }
    )
    return df.select(*TIER_COLUMNS_STORED, "bucket_id", "_v")


def test_tool_vocab_prefix_merge_decodes_old_snapshots(spark, tmp_path):
    """Masks written under an earlier (shorter) vocab must decode correctly
    after a later run appends new tools: bit positions are append-only."""
    from mpnsm_spark.plans.pipeline import read_tier, reconcile_tool_vocab

    io = TableIO(str(tmp_path / "whv"))
    io.append(_tier_snap(spark, "a", 1, 0, 1), "tier_1m", meta={"tool_vocab": ["zeta"]})
    merged = reconcile_tool_vocab(io, ["alpha", "zeta"])
    assert merged == ["zeta", "alpha"]  # zeta keeps bit 0, alpha appends
    io.append(_tier_snap(spark, "b", 2, 1, 2), "tier_1m", meta={"tool_vocab": merged})
    out = {r.conv_id: r.tools for r in read_tier(spark, io, "1m").collect()}
    assert out == {"a": ["zeta"], "b": ["alpha"]}


def test_tool_vocab_divergence_fails_loudly(spark, tmp_path):
    """A snapshot encoded under a NON-prefix vocab (the pre-fix re-sorted
    dictionary) must refuse to decode instead of silently swapping tools."""
    from mpnsm_spark.plans.pipeline import read_tier, reconcile_tool_vocab

    io = TableIO(str(tmp_path / "whd"))
    io.append(_tier_snap(spark, "a", 1, 0, 1), "tier_1m", meta={"tool_vocab": ["zeta"]})
    io.append(
        _tier_snap(spark, "b", 1, 0, 2),
        "tier_1m",
        meta={"tool_vocab": ["alpha", "zeta"]},  # re-sorted: zeta moved to bit 1
    )
    with pytest.raises(ValueError, match="prefix"):
        read_tier(spark, io, "1m")
    with pytest.raises(ValueError, match="divergence"):
        reconcile_tool_vocab(io, ["alpha"])


def test_kernel_stage_error_lineage_and_resume(spark, transcripts, tmp_path):
    """A poisoned series in a kernel stage: the run completes, the poisoned
    bucket gets a status='error' lineage row (stage, bucket_id, error class),
    the summary reports it, and resume reprocesses ONLY the errored bucket."""
    from mpnsm_spark.plans.pipeline import KernelStage, run_kernel_stage

    poison_conv = transcripts.select("conv_id").first().conv_id
    calls = {"poisoned": True}

    def make_kernel(poison: bool):
        def kernel(pdf):
            if poison and (pdf["conv_id"] == poison_conv).any():
                raise ValueError("poisoned series")
            return pdf.groupby("conv_id", as_index=False).agg(
                n=("turn_count", "sum")
            )
        return kernel

    def stage(poison):
        return KernelStage(
            name="per_conv_totals",
            fn=make_kernel(poison),
            output_schema="conv_id string, n long",
            source="1m",
        )

    io = TableIO(str(tmp_path / "whk"))
    summary = run_pipeline(
        spark, transcripts, io, _cfg(kernel_stages=(stage(True),))
    )
    ks = summary["kernel_stages"]["per_conv_totals"]
    assert ks["errored_series"] == 1
    assert list(ks["buckets_error"].values()) == ["ValueError"]
    bad_bucket = next(iter(ks["buckets_error"]))
    lin = io.read(spark, LINEAGE_TABLE, merge_schema=True).toPandas()
    err_rows = lin[(lin.stage == "per_conv_totals") & (lin.status == "error")]
    assert set(err_rows.bucket_id) == {bad_bucket}
    assert (err_rows.error_class == "ValueError").all()
    assert int(err_rows.n_errors.sum()) == 1
    # run completed: every OTHER stage fully green, integrity intact
    assert summary["integrity_ok"]

    # resume with a healthy kernel: ONLY the errored bucket reprocesses
    summary2 = run_pipeline(
        spark, transcripts, io, _cfg(kernel_stages=(stage(False),))
    )
    ks2 = summary2["kernel_stages"]["per_conv_totals"]
    assert ks2["buckets_run"] == 1
    assert ks2["buckets_error"] == {}
    assert all(v == 0 for v in summary2["stages"].values())
    # stage table now covers every conversation exactly once (keep-last)
    from mpnsm_spark.plans.pipeline import _latest_snapshot

    stored = _latest_snapshot(io.read(spark, "per_conv_totals"))
    n_convs = transcripts.select("conv_id").distinct().count()
    assert stored.select("conv_id").distinct().count() == n_convs
    assert stored.count() == n_convs


def test_kernel_stage_sub_splits_hot_conversations(spark, transcripts, tmp_path):
    """split_threshold bounds every kernel group; per-sub partial outputs
    re-merge associatively to the unsplit result."""
    from mpnsm_spark.plans.pipeline import KernelStage, run_kernel_stage

    def kernel(pdf):
        return pdf.groupby("conv_id", as_index=False).agg(n=("turn_idx", "count"))

    def stage(name, thr):
        return KernelStage(
            name=name,
            fn=kernel,
            output_schema="conv_id string, n long",
            source="norm",
            order_col="turn_idx",
            split_threshold=thr,
        )

    io = TableIO(str(tmp_path / "whs"))
    norm = normalize(transcripts, 4)
    r_split = run_kernel_stage(spark, io, stage("counts_split", 50), norm)
    assert r_split["buckets_error"] == {}
    split_out = (
        io.read(spark, "counts_split").groupBy("conv_id").agg(F.sum("n").alias("n"))
    ).toPandas().set_index("conv_id")["n"]
    want = (
        norm.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    )
    assert split_out.sort_index().equals(want.sort_index().astype(split_out.dtype))
    # groups were genuinely bounded: at least one conversation got split
    assert io.read(spark, "counts_split").groupBy("conv_id").count().filter(
        "count > 1"
    ).count() > 0


def test_kernel_stage_split_with_bucket_start_default(spark, transcripts, tmp_path):
    """split_threshold must work with the dataclass's own default
    order_col='bucket_start' (a timestamp) on a tier-shaped source —
    previously an AnalysisException at plan time (ADVICE r3)."""
    from mpnsm_spark.operators.rollup import rollup_raw
    from mpnsm_spark.plans.pipeline import KernelStage, run_kernel_stage

    def kernel(pdf):
        return pdf.groupby("conv_id", as_index=False).agg(
            n=("bucket_start", "count")
        )

    stage = KernelStage(
        name="tier_counts_split",
        fn=kernel,
        output_schema="conv_id string, n long",
        source="1m",
        split_threshold=25,  # order_col left at the 'bucket_start' default
    )
    io = TableIO(str(tmp_path / "whts"))
    tier = rollup_raw(normalize(transcripts, 4), "1m")
    r = run_kernel_stage(spark, io, stage, tier)
    assert r["buckets_error"] == {}
    got = (
        io.read(spark, "tier_counts_split")
        .groupBy("conv_id")
        .agg(F.sum("n").alias("n"))
        .toPandas()
        .set_index("conv_id")["n"]
    )
    want = (
        tier.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    )
    assert got.sort_index().equals(want.sort_index().astype(got.dtype))


def test_pipeline_default_forecast_stage_coefficients_in_lineage(
    spark, transcripts, tmp_path
):
    """The pipeline's default forecast stage is the REAL model
    (TrendSeasonalOLS via ols_forecast_stage, not a surrogate): running it as
    a kernel stage records every fitted series' coefficients in the versioned
    stage table, and read_forecast_models exposes one coefficient row per
    fitted series that matches a local refit bitwise."""
    import numpy as np

    from mpnsm_spark.functions.model import TrendSeasonalOLS
    from mpnsm_spark.plans.pipeline import ols_forecast_stage, read_forecast_models

    io = TableIO(str(tmp_path / "whf"))
    stage = ols_forecast_stage(
        horizon=5, min_train=5, model_kwargs={"n_changepoints": 2}
    )
    summary = run_pipeline(spark, transcripts, io, _cfg(kernel_stages=(stage,)))
    assert summary["kernel_stages"]["forecast"]["buckets_error"] == {}

    tier = read_tier(spark, io, "1m").toPandas().sort_values(
        ["conv_id", "bucket_start"]
    )
    sizes = tier.groupby("conv_id").size()
    fitted_expected = set(sizes[sizes >= 5].index)

    models = read_forecast_models(spark, io).toPandas().set_index("conv_id")
    # every fitted series has a coefficient row in the persisted model lineage
    assert set(models.index) == fitted_expected
    assert (models["coef_names"].str.len() > 0).all()

    fc = io.read(spark, "forecast").toPandas()
    for conv, g in tier.groupby("conv_id"):
        if conv not in fitted_expected:
            continue
        m = TrendSeasonalOLS(n_changepoints=2).fit(
            g["value_avg"].to_numpy(np.float64)
        )
        row = models.loc[conv]
        coefs = m.coefficients()
        assert list(row["coef_names"]) == list(coefs)
        assert (
            np.asarray(row["coef_values"]) == np.array(list(coefs.values()))
        ).all()
        got = fc[fc["conv_id"] == conv].sort_values("step")["yhat"].to_numpy()
        assert (got == m.predict(5)).all()
