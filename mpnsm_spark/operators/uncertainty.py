"""Prediction-interval generation from residual quantiles.

Reference analog: ``/root/reference/mpnsm/time_series/prophet/
ts_uncertainty.py:1-125`` — uncertainty intervals derived from the empirical
distribution of model residuals (the reference samples posterior trends; the
engine's model-agnostic equivalent takes per-series residual quantiles and
offsets the point forecast). Closes the loop with the ``coverage`` /
``weighted_ci`` metrics in functions/metrics.py: this operator *produces* the
intervals those metrics score.

Pure Spark SQL: one grouped exact-percentile aggregation over residuals,
broadcast back; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def residual_intervals(
    df: DataFrame,
    key: str = "conv_id",
    y_col: str = "y",
    yhat_col: str = "yhat",
    lo_q: float = 0.1,
    hi_q: float = 0.9,
    keep_debug: bool = False,
) -> DataFrame:
    """Append [yhat_lo, yhat_hi] per row from per-series residual quantiles.

    interval = yhat + [q_lo(resid), q_hi(resid)] where resid = y - yhat over
    the series' scored rows (exact interpolated percentile, matching the
    reference's empirical-quantile interval construction). Also flags
    ``covered`` (y inside the interval) so a downstream agg yields empirical
    coverage directly.

    ``keep_debug=True`` keeps the fitted residual quantiles themselves as
    ``resid_q_lo``/``resid_q_hi`` columns — the reference's enriched-output
    contract (coefficients/debug attached to every forecast row,
    ``model.py:194-222``).
    """
    resid = (F.col(y_col) - F.col(yhat_col)).alias("_r")
    qs = df.select(key, resid).groupBy(key).agg(
        F.percentile("_r", lo_q).alias("_q_lo"),
        F.percentile("_r", hi_q).alias("_q_hi"),
    )
    out = df.join(F.broadcast(qs), key)
    lo = F.col(yhat_col) + F.col("_q_lo")
    hi = F.col(yhat_col) + F.col("_q_hi")
    out = (
        out.withColumn("yhat_lo", lo)
        .withColumn("yhat_hi", hi)
        .withColumn(
            "covered", (F.col(y_col) >= lo) & (F.col(y_col) <= hi)
        )
    )
    if keep_debug:
        return out.withColumnsRenamed({"_q_lo": "resid_q_lo", "_q_hi": "resid_q_hi"})
    return out.drop("_q_lo", "_q_hi")


def interval_coverage(intervals: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-series empirical coverage + mean interval width (the quantities
    the reference's coverage metric consumes)."""
    width = F.col("yhat_hi") - F.col("yhat_lo")
    return intervals.groupBy(key).agg(
        F.avg(F.col("covered").cast("double")).alias("coverage"),
        F.avg(width).alias("mean_width"),
        F.count(F.lit(1)).alias("n"),
    )
