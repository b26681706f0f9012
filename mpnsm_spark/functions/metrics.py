"""Forecast-quality metric kernels as closed-form Spark aggregates.

Reference analogs (``/root/reference/mpnsm/time_series/metrics.py``): WMAPE
(``:249-283``), WeightedCI (``:130-149``), WMAPECI (combined), plus the
grouped-metric dispatcher (``:57-60``). All are expressible as pure SQL
aggregations (SURVEY.md A3/F3) — no UDF, codegen throughout — and can be
evaluated per group via ``groupBy(...).agg(...)``.

Each builder returns a Column so callers compose them:
``df.groupBy("conv_id").agg(wmape("y", "yhat"), coverage("y", "lo", "hi"))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wmape(y: str = "y", yhat: str = "yhat") -> Column:
    """sum(|y - yhat|) / sum(|y|) — weighted mean absolute pct error."""
    return (
        F.sum(F.abs(F.col(y) - F.col(yhat))) / F.sum(F.abs(F.col(y)))
    ).alias("wmape")


def bias(y: str = "y", yhat: str = "yhat") -> Column:
    """sum(yhat - y) / sum(|y|) — signed over/under-forecast mass."""
    return (F.sum(F.col(yhat) - F.col(y)) / F.sum(F.abs(F.col(y)))).alias("bias")


def coverage(y: str = "y", lo: str = "yhat_lower", hi: str = "yhat_upper") -> Column:
    """Share of actuals inside the prediction interval (WeightedCI analog)."""
    inside = F.when(
        (F.col(y) >= F.col(lo)) & (F.col(y) <= F.col(hi)), F.lit(1)
    ).otherwise(F.lit(0))
    return (F.sum(inside) / F.count(F.lit(1))).alias("coverage")


def weighted_ci(y: str = "y", lo: str = "yhat_lower", hi: str = "yhat_upper") -> Column:
    """Interval-miss mass over actual mass: sum(dist outside interval)/sum(|y|)
    — the reference's WeightedCI shape (``metrics.py:130-149``)."""
    miss = F.when(F.col(y) > F.col(hi), F.col(y) - F.col(hi)).when(
        F.col(y) < F.col(lo), F.col(lo) - F.col(y)
    ).otherwise(F.lit(0.0))
    return (F.sum(miss) / F.sum(F.abs(F.col(y)))).alias("weighted_ci")


def ci_width(yhat: str = "yhat", lo: str = "yhat_lower", hi: str = "yhat_upper") -> Column:
    """The reference's literal WeightedCI equation (``metrics.py:111``):
    ``sum(|upper - lower|) / sum(|pred|)`` — interval WIDTH mass relative to
    prediction mass (sharpness; lower is better)."""
    return (
        F.sum(F.abs(F.col(hi) - F.col(lo))) / F.sum(F.abs(F.col(yhat)))
    ).alias("ci_width")


def wmapeci(
    y: str = "y",
    yhat: str = "yhat",
    lo: str = "yhat_lower",
    hi: str = "yhat_upper",
    ci_coef: float = 0.5,
    wmape_coef: float = 0.5,
) -> Column:
    """The reference's combined WMAPECI metric (``metrics.py:301-380``):
    ``(ci_coef·ci + wmape_coef·wmape) / (ci_coef + wmape_coef)`` with ci =
    the WeightedCI width ratio and wmape the weighted error."""
    ci = F.sum(F.abs(F.col(hi) - F.col(lo))) / F.sum(F.abs(F.col(yhat)))
    wm = F.sum(F.abs(F.col(y) - F.col(yhat))) / F.sum(F.abs(F.col(y)))
    return (
        (F.lit(float(ci_coef)) * ci + F.lit(float(wmape_coef)) * wm)
        / F.lit(float(ci_coef) + float(wmape_coef))
    ).alias("wmapeci")


def mean_abs_pct(y: str = "y", yhat: str = "yhat") -> Column:
    """mean(|y-ŷ|/|y|) (``deprecated/ts_utils.py:244-245``)."""
    return F.avg(F.abs(F.col(y) - F.col(yhat)) / F.abs(F.col(y))).alias(
        "mean_abs_pct"
    )


def median_abs_pct(y: str = "y", yhat: str = "yhat") -> Column:
    """median(|y-ŷ|/|y|) (``deprecated/ts_utils.py:246-247``)."""
    return F.median(F.abs(F.col(y) - F.col(yhat)) / F.abs(F.col(y))).alias(
        "median_abs_pct"
    )


def mae(y: str = "y", yhat: str = "yhat") -> Column:
    return F.avg(F.abs(F.col(y) - F.col(yhat))).alias("mae")


def rmse(y: str = "y", yhat: str = "yhat") -> Column:
    return F.sqrt(F.avg(F.pow(F.col(y) - F.col(yhat), 2))).alias("rmse")


def grouped_metrics(
    df: DataFrame, group_cols: list[str], metrics: list[Column]
) -> DataFrame:
    """Per-group metric evaluation (reference `metrics.py:57-60` dispatcher)."""
    return df.groupBy(*group_cols).agg(*metrics)
