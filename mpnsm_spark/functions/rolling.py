"""Centered rolling windows + Fourier seasonality terms (SURVEY.md W2/W3,
Sc-math).

Reference parity:

- :func:`rolling_median` — centered rolling median trend extraction
  (``/root/reference/mpnsm/time_series/utils.py:207-217``,
  ``deprecated/ts_utils.py:52-58``): exact ``percentile(0.5)`` over a rows
  frame with ``min_periods=1`` edge semantics (frame shrinks at the edges).
- :func:`rolling_cap_floor` — centered rolling max/min cap & floor columns
  (``model.py:240-261``, ``deprecated/ts_model.py:297-310``).
- :func:`fourier_terms` — sin/cos cyclical features
  (``utils.py:84-90``): ``sin/cos(2π·k·t/period)`` for k = 1..order, the
  reference's core seasonality regressor generator.

All pure Spark SQL window/projection expressions — whole-stage codegen, no
UDFs, no shuffle beyond the window's partitioning (which the pipeline already
provides on conv_id).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _centered(key: str, order_col, window: int) -> Window:
    half = window // 2
    return (
        Window.partitionBy(key)
        .orderBy(*order_col if isinstance(order_col, (list, tuple)) else [order_col])
        .rowsBetween(-half, half)
    )


def rolling_median(
    df: DataFrame,
    window: int = 5,
    key: str = "conv_id",
    value_col: str = "value",
    order_col="bucket_start",
    out_col: str = "roll_median",
) -> DataFrame:
    """Centered rolling EXACT median (pandas ``rolling(center=True,
    min_periods=1).median()`` semantics: the frame simply shrinks at series
    edges)."""
    w = _centered(key, order_col, window)
    return df.withColumn(out_col, F.percentile(value_col, 0.5).over(w))


def rolling_cap_floor(
    df: DataFrame,
    window: int = 5,
    key: str = "conv_id",
    value_col: str = "value",
    order_col="bucket_start",
) -> DataFrame:
    """Centered rolling max/min caps + the value clamped into [floor, cap]."""
    w = _centered(key, order_col, window)
    cap = F.max(value_col).over(w)
    floor = F.min(value_col).over(w)
    return (
        df.withColumn("cap", cap)
        .withColumn("floor", floor)
        .withColumn(
            "value_clamped", F.least(F.greatest(F.col(value_col), floor), cap)
        )
    )


def fourier_terms(
    df: DataFrame,
    ts_col: str = "ts",
    period_seconds: int = 86400,
    order: int = 3,
    round_dp: int | None = 6,
) -> DataFrame:
    """Append ``sin_k`` / ``cos_k`` columns for k = 1..order.

    The angle is ``2π·k·epoch_seconds/period``. ``round_dp`` rounds the trig
    outputs (default 6dp) so features are reproducible across engines/libm
    implementations; pass ``None`` for full precision.
    """
    t = F.unix_timestamp(F.col(ts_col)).cast("double")
    out = df
    for k in range(1, order + 1):
        angle = F.lit(2.0 * math.pi * k) * t / F.lit(float(period_seconds))
        s, c = F.sin(angle), F.cos(angle)
        if round_dp is not None:
            # `+ 0.0` canonicalizes IEEE signed zero (-0.0 -> +0.0) so the
            # bit pattern matches engines whose round() preserves -0.0.
            s = F.round(s, round_dp) + F.lit(0.0)
            c = F.round(c, round_dp) + F.lit(0.0)
        out = out.withColumn(f"sin_{k}", s).withColumn(f"cos_{k}", c)
    return out
