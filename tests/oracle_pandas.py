"""Pure-pandas reference implementation of the engine's core semantics.

This is the correctness oracle mandated by BASELINE.json: tier rollup points,
gap-fill values (LOCF + linear), and Gorilla streams are compared
point-for-point against these functions. It intentionally mirrors the
reference's pandas idioms (groupby/transform, ffill/bfill, date_range grids —
``/root/reference/mpnsm/time_series/utils.py:93-129``, ``model.py:357-359``,
``forecast.py:435-444``) without copying code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FREQ = {"1m": "min", "1h": "h", "1d": "D"}


def rollup_pandas(pdf: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Reference rollup: groupby (conv_id, ts floored to tier)."""
    df = pdf.sort_values(["conv_id", "turn_idx"]).copy()
    df["bucket_start"] = df["ts"].dt.floor(FREQ[tier])
    g = df.groupby(["conv_id", "bucket_start"], sort=True)

    def per_bucket(b: pd.DataFrame) -> pd.Series:
        tools = sorted(set(b["tool"].dropna()))
        return pd.Series(
            {
                "turn_count": len(b),
                "first_turn_idx": int(b["turn_idx"].min()),
                "last_turn_idx": int(b["turn_idx"].max()),
                "n_user": int((b["role"] == "user").sum()),
                "n_assistant": int((b["role"] == "assistant").sum()),
                "n_system": int((b["role"] == "system").sum()),
                "n_tool": int((b["role"] == "tool").sum()),
                "tools": tools,
                "distinct_tools": len(tools),
                "value_sum": float(b["value"].sum()),
                "value_min": float(b["value"].min()),
                "value_max": float(b["value"].max()),
                "value_avg": float(b["value"].sum()) / len(b),
                "first_value": float(b.loc[b["turn_idx"].idxmin(), "value"]),
                "last_value": float(b.loc[b["turn_idx"].idxmax(), "value"]),
            }
        )

    return g.apply(per_bucket, include_groups=False).reset_index()


def gapfill_pandas(tier_pdf: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Reference gap-fill: dense per-conv grid + ffill/bfill + linear interp.

    Mirrors reference semantics: LOCF = ffill (model.py:357-359), head fill =
    bfill (model.py:250), linear interpolation between anchors with LOCF/NOCB
    at the ends (pandas interpolate with limit_direction='both').
    """
    out = []
    for conv, g in tier_pdf.groupby("conv_id", sort=True):
        g = g.sort_values("bucket_start").set_index("bucket_start")
        grid = pd.date_range(g.index.min(), g.index.max(), freq=FREQ[tier])
        r = g[["value_avg"]].reindex(grid)
        res = pd.DataFrame(
            {
                "conv_id": conv,
                "bucket_start": grid,
                "is_gap": r["value_avg"].isna().values,
                "value_locf": r["value_avg"].ffill().bfill().values,
                "value_linear": r["value_avg"]
                .interpolate(method="linear", limit_direction="both")
                .values,
            }
        )
        out.append(res)
    return pd.concat(out, ignore_index=True)


def compare_frames(
    actual: pd.DataFrame,
    expected: pd.DataFrame,
    keys: list[str],
    float_cols: tuple[str, ...] = (),
    atol: float = 1e-9,
) -> None:
    """Point-for-point comparison helper: sort both on keys, compare all cols."""
    a = actual.sort_values(keys).reset_index(drop=True)
    e = expected.sort_values(keys).reset_index(drop=True)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    assert set(a.columns) >= set(e.columns), f"missing cols {set(e.columns) - set(a.columns)}"
    for col in e.columns:
        av, ev = a[col], e[col]
        if col in float_cols:
            np.testing.assert_allclose(
                av.astype(float).values, ev.astype(float).values, atol=atol, rtol=1e-12,
                err_msg=f"column {col}",
            )
        elif ev.dtype == object and len(ev) and isinstance(ev.iloc[0], (list, np.ndarray)):
            for i, (x, y) in enumerate(zip(av, ev)):
                assert list(x) == list(y), f"column {col} row {i}: {x} != {y}"
        else:
            assert av.astype(str).tolist() == ev.astype(str).tolist(), f"column {col}"
