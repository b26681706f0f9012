"""Gap-fill correctness vs pandas ffill/bfill/interpolate oracle."""

import pandas as pd
import pytest

from mpnsm_spark.operators.gapfill import gapfill, gapfill_anchored
from mpnsm_spark.operators.rollup import rollup_raw

from .oracle_pandas import compare_frames, gapfill_pandas, rollup_pandas

KEYS = ["conv_id", "bucket_start"]
FLOATS = ("value_locf", "value_linear")


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_gapfill_matches_pandas(transcripts, tier):
    tier_df = rollup_raw(transcripts, tier)
    actual = gapfill(tier_df, tier).toPandas()
    expected = gapfill_pandas(rollup_pandas(transcripts.toPandas(), tier), tier)
    compare_frames(actual, expected, KEYS, float_cols=FLOATS)


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_gapfill_anchored_bitwise_equals_generic(transcripts, tier):
    """The fused single-window path must be bitwise-identical to the generic
    grid-join path on null-free (tier) input — the pipeline relies on it."""
    tier_df = rollup_raw(transcripts, tier)
    a = (
        gapfill_anchored(tier_df, tier)
        .toPandas()
        .sort_values(KEYS)
        .reset_index(drop=True)
    )
    g = gapfill(tier_df, tier).toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(a) == len(g)
    assert a["is_gap"].equals(g["is_gap"])
    for c in FLOATS:
        assert (a[c].to_numpy() == g[c].to_numpy()).all(), c


def test_gapfill_fills_known_hole(spark):
    """Hand-built series: values at t0, t0+3h → 1h gapfill has 2 gap rows with
    exact linear values."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 2,
            "bucket_start": pd.to_datetime(["2025-01-01 00:00", "2025-01-01 03:00"]),
            "value_avg": [10.0, 40.0],
        }
    )
    tier_df = spark.createDataFrame(pdf)
    out = (
        gapfill(tier_df, "1h").orderBy("bucket_start").toPandas()
    )
    assert len(out) == 4
    assert out["is_gap"].tolist() == [False, True, True, False]
    assert out["value_locf"].tolist() == [10.0, 10.0, 10.0, 40.0]
    assert out["value_linear"].tolist() == [10.0, 20.0, 30.0, 40.0]


def test_gapfill_single_point_conv(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "bucket_start": pd.to_datetime(["2025-01-01 00:00"]),
            "value_avg": [5.0],
        }
    )
    out = gapfill(spark.createDataFrame(pdf), "1m").toPandas()
    assert len(out) == 1
    assert out["value_locf"].tolist() == [5.0]
    assert out["value_linear"].tolist() == [5.0]
    assert out["is_gap"].tolist() == [False]


def test_gapfill_null_anchor_head(spark):
    """Null value in the first bucket: head rows NOCB-fill, linear falls back."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 2,
            "bucket_start": pd.to_datetime(["2025-01-01 00:00", "2025-01-01 02:00"]),
            "value_avg": [None, 7.0],
        }
    )
    out = gapfill(spark.createDataFrame(pdf), "1h").orderBy("bucket_start").toPandas()
    assert out["value_locf"].tolist() == [7.0, 7.0, 7.0]
    assert out["value_linear"].tolist() == [7.0, 7.0, 7.0]


def test_gapfill_max_buckets_cap(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 2,
            "bucket_start": pd.to_datetime(["2025-01-01 00:00", "2025-03-01 00:00"]),
            "value_avg": [1.0, 2.0],
        }
    )
    out = gapfill(spark.createDataFrame(pdf), "1h", max_buckets_per_conv=10).toPandas()
    assert len(out) == 10


def test_gapfill_anchored_tolerates_duplicate_anchors(spark):
    """Duplicate (conv_id, bucket_start) anchors (un-deduped multi-snapshot
    read) must not crash the F.sequence expansion; each duplicate emits
    itself as a no-gap row."""
    from pyspark.sql import functions as F

    tier = spark.createDataFrame(
        [
            ("c", "2025-01-01 00:00:00", 1.0),
            ("c", "2025-01-01 00:00:00", 1.0),  # duplicate anchor
            ("c", "2025-01-01 03:00:00", 4.0),
        ],
        "conv_id string, bucket_start string, value_avg double",
    ).withColumn("bucket_start", F.to_timestamp("bucket_start"))
    out = gapfill_anchored(tier, "1h").toPandas()
    # 2 duplicate no-gap rows at t0 + gaps 01:00,02:00 + anchor 03:00
    assert len(out) == 5
    assert int(out["is_gap"].sum()) == 2
    assert not out["value_locf"].isna().any()
