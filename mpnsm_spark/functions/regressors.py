"""Declarative regressor-column builders — pure-SQL feature generators that
feed the per-series model (``functions.model.TrendSeasonalOLS``) and the
search harness.

Reference parity (``/root/reference/mpnsm/time_series/regressor.py``):

- ``CalculatedRegressor`` (``:38-71``) — engine analog already exists as
  ``functions.calc`` lambda columns; the LAGGED special case is declarative
  here (:func:`with_lagged_regressors`) because a lag is a window, not a
  row-local lambda.
- ``SpecialEventRegressor`` (``:73-120``) — an ``is_<name>`` column that is 0
  except on declared dates (scalar date → exact match, (start, end) tuple →
  inclusive interval), each carrying an optional per-entry value
  (default 1): :func:`with_special_event_regressor`.
- ``BigChangerRegressor`` (``:122-160``) — one 0/1 column PER declared date:
  ``after_<date>`` for scalars (``date_col >= date``) and
  ``between_<start>_<end>`` for intervals: :func:`with_big_changer_regressors`.

All builders are single projections (no shuffle, no UDF); the lag builder is
one window function over the series' natural partitioning.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_lagged_regressors(
    df: DataFrame,
    lags: Mapping[str, Sequence[int]],
    key: str = "conv_id",
    order_col: str = "turn_idx",
    fill: float | None = None,
) -> DataFrame:
    """Append ``<col>_lag<k>`` columns: the column's value k rows earlier
    within the series. ``fill`` (default None → null) pads the first k rows.

    One window spec serves every lag, so Catalyst plans a single sort per
    partitioning — the lags add no extra exchange when ``df`` is already
    clustered by ``key``.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    cols = {}
    for col, ks in lags.items():
        for k in ks:
            if k <= 0:
                raise ValueError(f"lag must be positive, got {k} for {col!r}")
            lagged = F.lag(F.col(col), k).over(w)
            cols[f"{col}_lag{k}"] = (
                lagged if fill is None else F.coalesce(lagged, F.lit(float(fill)))
            )
    return df.withColumns(cols)


def _norm_name(val) -> str:
    return str(val).replace(" ", "_").replace(":", "").replace("-", "")


def with_special_event_regressor(
    df: DataFrame,
    name: str,
    dates: Sequence[Mapping],
    date_col: str = "bucket_start",
) -> DataFrame:
    """One ``is_<name>`` column, 0 by default; each entry
    ``{"date": scalar | (start, end) | [..], "value": v=1}`` stamps its value
    on matching rows (later entries override earlier, matching the
    reference's sequential ``np.where`` overwrites)."""
    col = F.lit(0.0)
    day = F.to_date(F.col(date_col))
    for entry in dates:
        entry_dates = entry["date"]
        value = float(entry.get("value", 1))
        if not isinstance(entry_dates, list):
            entry_dates = [entry_dates]
        for d in entry_dates:
            if isinstance(d, tuple):
                cond = day.between(F.lit(d[0]), F.lit(d[1]))
            else:
                cond = day == F.lit(d)
            col = F.when(cond, F.lit(value)).otherwise(col)
    return df.withColumn(f"is_{name}", col)


def with_big_changer_regressors(
    df: DataFrame,
    dates: Sequence,
    date_col: str = "bucket_start",
) -> DataFrame:
    """Regime-dummy columns, one per declared change: ``after_<d>`` = 1 from
    date d on; ``between_<d1>_<d2>`` = 1 inside the inclusive interval."""
    day = F.to_date(F.col(date_col))
    cols = {}
    for d in dates:
        if isinstance(d, tuple):
            cols[f"between_{_norm_name(d[0])}_{_norm_name(d[1])}"] = (
                day.between(F.lit(d[0]), F.lit(d[1]))
            ).cast("int")
        else:
            cols[f"after_{_norm_name(d)}"] = (day >= F.lit(d)).cast("int")
    return df.withColumns(cols)
