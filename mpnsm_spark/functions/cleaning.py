"""Column-hygiene utilities from the reference's preprocessing.

- :func:`all_null_columns` / :func:`drop_all_null_columns` — reference drops
  all-null columns before fit (``/root/reference/mpnsm/time_series/
  forecast.py:306``; SURVEY.md P7). No direct Spark primitive: one aggregate
  computing a non-null count per column, then a driver-side prune.
- :func:`binary_columns` — dummy-column detection (``utils.py:221-225``;
  SURVEY.md P9): columns whose min/max lie in {0,1}.

Both run ONE aggregation regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def all_null_columns(df: DataFrame, cols: list[str] | None = None) -> list[str]:
    cols = cols or df.columns
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in cols]
    ).collect()[0]
    return [c for c in cols if counts[c] == 0]


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    return df.drop(*all_null_columns(df))


def binary_columns(df: DataFrame, cols: list[str] | None = None) -> list[str]:
    """Numeric columns whose observed values are all within {0, 1}."""
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "double", "float", "smallint", "tinyint")
    ]
    cols = [c for c in (cols or numeric) if c in numeric]
    if not cols:
        return []
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}__mn"))
        aggs.append(F.max(c).alias(f"{c}__mx"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        mn, mx = row[f"{c}__mn"], row[f"{c}__mx"]
        if mn is not None and mn in (0, 1) and mx in (0, 1):
            out.append(c)
    return out
