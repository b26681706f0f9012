"""Hierarchical forecast reconciliation (BU / OLS / WLSS).

Reference parity: ``/root/reference/mpnsm/time_series/deprecated/
hierarchical_models.py:1-62`` — a thin wrapper revising base forecasts with
the ``hts`` package's bottom-up / OLS / WLSS methods over a two-level
hierarchy (total ← series). The engine implements the same revisions in
CLOSED FORM, derived from the standard projection
``ỹ = S (S'W⁻¹S)⁻¹ S'W⁻¹ ŷ`` for the two-level summing matrix:

with k bottom series, base forecasts ŷ_i, base total ŷ_T, aggregate
``s = Σ ŷ_i`` and discrepancy ``d = ŷ_T − s``:

- **bu**:   ỹ_i = ŷ_i                     (total recomputed as s)
- **ols**:  ỹ_i = ŷ_i + d / (k + 1)        ((I+J)⁻¹ = I − J/(k+1))
- **wlss**: ỹ_i = ŷ_i + d / (2k)           (structural weights diag(k,1..1))

and the reconciled total is coherent by construction: ỹ_T = Σ ỹ_i.

All pure Spark SQL — one per-step aggregation (decimal-exact sum so the
DuckDB oracle replays bitwise) broadcast back, then a projection. No UDFs,
no window over the full data, scales as one map-side-combined aggregate of
(steps × series) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COEF = {"bu": None, "ols": "k + 1", "wlss": "2 * k"}


def reconcile_forecasts(
    bottom: DataFrame,
    total: DataFrame,
    method: str = "ols",
    key: str = "conv_id",
    step_col: str = "step",
    yhat_col: str = "yhat",
) -> DataFrame:
    """Revise per-series base forecasts to aggregate coherence.

    ``bottom``: one row per (key, step) with the series' base forecast;
    ``total``: one row per step with the independently produced aggregate
    base forecast in column ``yhat_total``. Output adds ``yhat_rec`` (the
    revised series forecast) and ``yhat_total_rec`` (the coherent total,
    identical across rows of a step).

    The per-step sum uses the engine's DECIMAL(20,6) quantization contract
    so discrepancies — and therefore every revised value — are bitwise
    reproducible by an ANSI engine.
    """
    if method not in _COEF:
        raise ValueError(f"method must be one of {sorted(_COEF)}, got {method!r}")
    stats = bottom.groupBy(step_col).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col(yhat_col).cast("decimal(20,6)")).cast("double").alias("s"),
    )
    j = bottom.join(F.broadcast(stats), step_col).join(
        F.broadcast(total), step_col
    )
    d = F.col("yhat_total") - F.col("s")
    if method == "bu":
        rec = F.col(yhat_col)
    else:
        rec = F.col(yhat_col) + d / F.expr(_COEF[method])
    out = j.withColumn("yhat_rec", rec)
    # coherent total = s + k * adjustment (Σ of the revised bottom): exact
    # same float expression order as summing would give per the closed form.
    if method == "bu":
        tot = F.col("s")
    else:
        tot = F.col("s") + F.col("k") * (d / F.expr(_COEF[method]))
    return out.withColumn("yhat_total_rec", tot).drop("k", "s")
