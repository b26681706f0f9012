"""Declarative regressor builders vs pandas shift/isin oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mpnsm_spark.functions.regressors import (
    with_big_changer_regressors,
    with_lagged_regressors,
    with_special_event_regressor,
)


@pytest.fixture(scope="module")
def daily_df(spark):
    rows = []
    for conv in ("a", "b"):
        for i in range(20):
            rows.append((conv, i, f"2025-03-{i + 1:02d}", float(i) + (conv == "b") * 100))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "day", "value"])
    return spark.createDataFrame(pdf).withColumn(
        "bucket_start", F.to_timestamp("day")
    )


def test_lagged_regressors_match_pandas_shift(spark, daily_df):
    got = (
        with_lagged_regressors(daily_df, {"value": [1, 3]})
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = daily_df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for k in (1, 3):
        want = pdf.groupby("conv_id")["value"].shift(k)
        pd.testing.assert_series_equal(
            got[f"value_lag{k}"], want, check_names=False
        )
    # fill variant pads instead of nulling
    filled = with_lagged_regressors(daily_df, {"value": [2]}, fill=0.0).toPandas()
    assert filled["value_lag2"].notna().all()
    with pytest.raises(ValueError, match="positive"):
        with_lagged_regressors(daily_df, {"value": [0]})


def test_special_event_regressor_matches_pandas(spark, daily_df):
    got = (
        with_special_event_regressor(
            daily_df,
            "promo",
            [
                {"date": "2025-03-05", "value": 10},
                {"date": ("2025-03-10", "2025-03-12")},
                {"date": ["2025-03-03", "2025-03-04"], "value": 2},
            ],
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = daily_df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    day = pd.to_datetime(pdf["day"]).dt.date.astype(str)
    want = np.zeros(len(pdf))
    want = np.where(day == "2025-03-05", 10.0, want)
    want = np.where((day >= "2025-03-10") & (day <= "2025-03-12"), 1.0, want)
    want = np.where(day.isin(["2025-03-03", "2025-03-04"]), 2.0, want)
    np.testing.assert_array_equal(got["is_promo"].to_numpy(), want)


def test_big_changer_regressors_match_pandas(spark, daily_df):
    got = (
        with_big_changer_regressors(
            daily_df, ["2025-03-08", ("2025-03-02", "2025-03-04")]
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = daily_df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    day = pd.to_datetime(pdf["day"]).dt.date.astype(str)
    np.testing.assert_array_equal(
        got["after_20250308"].to_numpy(), (day >= "2025-03-08").astype(int)
    )
    np.testing.assert_array_equal(
        got["between_20250302_20250304"].to_numpy(),
        ((day >= "2025-03-02") & (day <= "2025-03-04")).astype(int),
    )


def test_lagged_regressor_feeds_model(spark, daily_df):
    """End-to-end: a lag column built here rides TrendSeasonalOLS as an
    extra regressor through the per-series kernel."""
    from mpnsm_spark.functions.model import TrendSeasonalOLS

    pdf = (
        with_lagged_regressors(daily_df, {"value": [1]}, fill=0.0)
        .filter(F.col("conv_id") == "a")
        .toPandas()
        .sort_values("turn_idx")
    )
    m = TrendSeasonalOLS(n_changepoints=0, ridge=0.0).fit(
        pdf["value"].to_numpy(float), extra=pdf["value_lag1"].to_numpy(float)
    )
    assert np.isfinite(m.beta_).all() and len(m.beta_) == 3
