"""Config-driven manager: hierarchical config inheritance end-to-end through
run_kernel_stage (reference TimeSeriesManager, manager.py:20-39/135-149,
config.py generate_full_tree coverage semantics)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mpnsm_spark.functions.model import TrendSeasonalOLS
from mpnsm_spark.plans.manager import (
    ManagerResult,
    resolve_unit_configs,
    run_manager,
)
from mpnsm_spark.plans.pipeline import PipelineConfig
from mpnsm_spark.sources.tableio import TableIO

N_TRAIN = 24
N_FUTURE = 4
START = dt.date(2024, 1, 1)


def _series(seed: float):
    t = np.arange(N_TRAIN)
    return np.round(10 + seed + 0.5 * t + 3 * np.sin(t / 2), 6)


@pytest.fixture(scope="module")
def panel(spark):
    """(region, store) panel: train rows carry sales/visits; future rows have
    null sales (the 'features data must already have future data' contract)."""
    rows = []
    units = [("A", "s1"), ("A", "s2"), ("B", "s3"), ("B", "s4")]
    for ui, (region, store) in enumerate(units):
        sales = _series(ui * 7.0)
        visits = _series(ui * 3.0 + 1.0)
        for i in range(N_TRAIN + N_FUTURE):
            ds = START + dt.timedelta(days=i)
            train = i < N_TRAIN
            rows.append(
                (
                    region,
                    store,
                    i,
                    ds.isoformat(),
                    float(sales[i]) if train else None,
                    float(visits[i]) if train else None,
                )
            )
    df = spark.createDataFrame(
        rows,
        "region string, store string, turn_idx int, ds string, "
        "sales double, visits double",
    )
    return df.cache()


CONFIG = [
    {
        "unit": {},
        "horizon": 5,
        "targets": [
            {"target_col": "sales", "model": {"n_changepoints": 2}},
            {
                "target_col": "visits",
                "model": {"n_changepoints": 1, "seasonality": [[7, 1]]},
            },
        ],
    },
    # finer level overrides ONLY horizon; targets inherit from the root (J7
    # field-level inheritance through resolve_config)
    {"unit": {"region": "B"}, "horizon": 3},
]


def _train_only(panel):
    return panel.filter(F.col("sales").isNotNull())


def test_resolve_unit_configs_inheritance(spark, panel):
    resolved = resolve_unit_configs(
        spark, panel, ["region", "store"], CONFIG
    ).toPandas()
    assert len(resolved) == 4
    by_region = resolved.groupby("region")["horizon"].unique()
    assert list(by_region["A"]) == [5]
    assert list(by_region["B"]) == [3]
    # targets inherited identically everywhere
    assert resolved["targets_json"].nunique() == 1


def test_resolve_coverage_assert(spark, panel):
    with pytest.raises(ValueError, match="does not cover"):
        resolve_unit_configs(
            spark,
            panel,
            ["region", "store"],
            [{"unit": {"region": "A"}, "targets": CONFIG[0]["targets"]}],
        )


def test_run_manager_two_targets_inherited_horizons(spark, panel, tmp_path):
    """Two targets, two hierarchy levels, end to end through run_kernel_stage;
    forecasts are bitwise-equal to local per-series TrendSeasonalOLS fits."""
    io = TableIO(str(tmp_path / "wh"))
    train = _train_only(panel)
    res = run_manager(
        spark,
        train,
        io,
        CONFIG,
        group_columns=["region", "store"],
        cfg=PipelineConfig(num_buckets=4),
    )
    assert res.groups == 2  # horizon 5 group and horizon 3 group
    assert len(res.stages) == 4  # 2 groups x 2 targets, each a kernel stage
    assert all(not s["buckets_error"] for s in res.stages)
    fc = res.forecasts(spark, io).toPandas()
    # horizons: region A stores get 5 steps, region B stores 3 — per target
    steps = fc.groupby(fc["_unit_id"].str.split("\x1f").str[0])["step"].max()
    assert steps["A"] == 5 and steps["B"] == 3
    assert set(fc["target"]) == {"sales", "visits"}

    # bitwise oracle: local numpy fit per (unit, target)
    pdf = train.toPandas().sort_values(["region", "store", "turn_idx"])
    for (region, store), g in pdf.groupby(["region", "store"]):
        horizon = 5 if region == "A" else 3
        for target, kwargs in (
            ("sales", {"n_changepoints": 2}),
            ("visits", {"n_changepoints": 1, "seasonality": ((7.0, 1),)}),
        ):
            m = TrendSeasonalOLS(**kwargs).fit(g[target].to_numpy(np.float64))
            exp = m.predict(horizon)
            got = (
                fc[
                    (fc["_unit_id"] == f"{region}\x1f{store}")
                    & (fc["target"] == target)
                ]
                .sort_values("step")["yhat"]
                .to_numpy()
            )
            assert (got == exp).all(), (region, store, target)


def test_run_manager_regressors_future_rows(spark, panel, tmp_path):
    """A target with declarative regressors forecasts the future grid using
    future-row regressor values — bitwise vs a local fit with extras."""
    io = TableIO(str(tmp_path / "wh"))
    event_day = (START + dt.timedelta(days=N_TRAIN + 1)).isoformat()
    config = [
        {
            "unit": {},
            "targets": [
                {
                    "target_col": "sales",
                    "model": {"n_changepoints": 1},
                    "regressors": [
                        {
                            "kind": "special_event",
                            "name": "promo",
                            "dates": [{"date": event_day, "value": 2.0}],
                        },
                        {"kind": "big_changer", "dates": ["2024-01-10"]},
                    ],
                }
            ],
        }
    ]
    res = run_manager(
        spark,
        panel,
        io,
        config,
        group_columns=["region", "store"],
        date_col="ds",
        cfg=PipelineConfig(num_buckets=4),
    )
    assert all(not s["buckets_error"] for s in res.stages)
    fc = res.forecasts(spark, io).toPandas()
    # every unit forecasts exactly the future grid (N_FUTURE rows)
    assert (fc.groupby("_unit_id")["step"].max() == N_FUTURE).all()

    pdf = panel.toPandas().sort_values(["region", "store", "turn_idx"])
    for (region, store), g in pdf.groupby(["region", "store"]):
        days = pd.to_datetime(g["ds"]).dt.date
        promo = np.where(days == dt.date.fromisoformat(event_day), 2.0, 0.0)
        after = (days >= dt.date(2024, 1, 10)).astype(float)
        X = np.column_stack([promo, after])
        tr = g["sales"].notna().to_numpy()
        m = TrendSeasonalOLS(n_changepoints=1).fit(
            g["sales"].to_numpy(np.float64)[tr], X[tr]
        )
        exp = m.predict(N_FUTURE, extra=X[~tr])
        got = (
            fc[fc["_unit_id"] == f"{region}\x1f{store}"]
            .sort_values("step")["yhat"]
            .to_numpy()
        )
        assert (got == exp).all(), (region, store)


def test_run_manager_regressor_without_future_errors_isolated(
    spark, panel, tmp_path
):
    """Regressors + no future rows violates the reference contract — the
    manager surfaces it as per-bucket error lineage, not a failed job."""
    io = TableIO(str(tmp_path / "wh"))
    config = [
        {
            "unit": {},
            "targets": [
                {
                    "target_col": "sales",
                    "model": {},
                    "regressors": [
                        {"kind": "big_changer", "dates": ["2024-01-10"]}
                    ],
                }
            ],
        }
    ]
    res = run_manager(
        spark,
        _train_only(panel),  # no future rows anywhere
        io,
        config,
        group_columns=["region", "store"],
        date_col="ds",
        cfg=PipelineConfig(num_buckets=4),
    )
    st = res.stages[0]
    assert st["errored_series"] == 4  # every unit poisoned, job survived
    assert st["buckets_error"]  # lineage carries the error buckets


def test_run_manager_tuning_spec(spark, panel, tmp_path):
    """A tuning spec in the config drives per-series grid search; the fitted
    forecast uses each series' tuned winner (verified via the engine's own
    tuner as the param oracle + a local fit)."""
    from mpnsm_spark.functions.model import ols_forecaster
    from mpnsm_spark.functions.tuning import tune_grid_per_series

    io = TableIO(str(tmp_path / "wh"))
    tuning = {"grid": {"n_changepoints": [1, 3]}, "n_folds": 2, "horizon": 4}
    config = [
        {
            "unit": {},
            "horizon": 4,
            "targets": [
                {"target_col": "sales", "model": {"min_distance": 2},
                 "tuning": tuning}
            ],
        }
    ]
    train = _train_only(panel).withColumn(
        "_uid", F.concat_ws("\x1f", "region", "store")
    )
    res = run_manager(
        spark,
        _train_only(panel),
        io,
        config,
        group_columns=["region", "store"],
        cfg=PipelineConfig(num_buckets=4),
    )
    fc = res.forecasts(spark, io).toPandas()
    chosen = {
        r["conv_id"]: int(r["value"])
        for r in tune_grid_per_series(
            train,
            tuning["grid"],
            ols_forecaster,
            n_folds=2,
            horizon=4,
            key="_uid",
            value_col="sales",
        ).collect()
        if r["param"] == "n_changepoints"
    }
    pdf = train.toPandas().sort_values(["_uid", "turn_idx"])
    for uid, g in pdf.groupby("_uid"):
        m = TrendSeasonalOLS(
            n_changepoints=chosen[uid], min_distance=2
        ).fit(g["sales"].to_numpy(np.float64))
        exp = m.predict(4)
        got = (
            fc[fc["_unit_id"] == uid].sort_values("step")["yhat"].to_numpy()
        )
        assert (got == exp).all(), uid


def test_run_manager_fit_then_predict(spark, panel, tmp_path):
    """run_mode='fit' persists state; run_mode='predict' reloads and
    forecasts bitwise-identically WITHOUT refitting (proven on corrupted
    input data)."""
    io = TableIO(str(tmp_path / "wh"))
    train = _train_only(panel)
    base = [
        {
            "unit": {},
            "horizon": 6,
            "targets": [{"target_col": "sales", "model": {"n_changepoints": 2}}],
        }
    ]
    fit_res = run_manager(
        spark, train, io, base, group_columns=["region", "store"],
        run_mode="fit", cfg=PipelineConfig(num_buckets=4),
    )
    assert fit_res.model_tables == ["mgr_models_sales"]
    assert not fit_res.forecast_tables

    reference = run_manager(
        spark, train, TableIO(str(tmp_path / "wh2")), base,
        group_columns=["region", "store"], cfg=PipelineConfig(num_buckets=4),
    ).forecasts(spark, TableIO(str(tmp_path / "wh2"))).toPandas()

    poisoned = train.withColumn("sales", F.col("sales") * 1000.0)
    pred_res = run_manager(
        spark, poisoned, io, base, group_columns=["region", "store"],
        run_mode="predict", cfg=PipelineConfig(num_buckets=4),
    )
    got = pred_res.forecasts(spark, io).toPandas()
    key = ["_unit_id", "target", "step"]
    a = got.sort_values(key).reset_index(drop=True)
    b = reference.sort_values(key).reset_index(drop=True)
    assert (a["yhat"].to_numpy() == b["yhat"].to_numpy()).all()


def test_manager_result_requires_tables(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        ManagerResult().forecasts(spark, TableIO(str(tmp_path / "whx")))


def test_run_manager_linear_hinge_matches_direct_fit(spark, panel, tmp_path):
    """model.forecaster='linear_hinge' routes the kernel through the
    SQL-replayable Cramer fit; per-series output equals calling
    linear_hinge_forecaster directly on the ordered train values."""
    from mpnsm_spark.functions.model import linear_hinge_forecaster

    config = [
        {
            "unit": {},
            "horizon": 5,
            "targets": [
                {"target_col": "sales", "model": {"forecaster": "linear_hinge"}}
            ],
        },
        {"unit": {"region": "B"}, "horizon": 3},
    ]
    io = TableIO(str(tmp_path / "hinge"))
    res = run_manager(
        spark,
        _train_only(panel),
        io,
        config,
        group_columns=["region", "store"],
        order_col="turn_idx",
        cfg=PipelineConfig(num_buckets=4),
    )
    got = res.forecasts(spark, io).toPandas()
    units = {("A", "s1"): 0, ("A", "s2"): 1, ("B", "s3"): 2, ("B", "s4"): 3}
    for (region, store), ui in units.items():
        horizon = 3 if region == "B" else 5
        want = linear_hinge_forecaster(_series(ui * 7.0), horizon, 0.5)
        g = got[got["_unit_id"] == f"{region}\x1f{store}"].sort_values("step")
        assert len(g) == horizon
        assert (g["yhat"].to_numpy() == want).all()  # bitwise


def test_run_manager_linear_hinge_rejects_unsupported_combos(spark, panel, tmp_path):
    io = TableIO(str(tmp_path / "hinge_bad"))

    def cfg_with(**target_extra):
        tgt = {"target_col": "sales", "model": {"forecaster": "linear_hinge"}}
        tgt.update(target_extra)
        return [{"unit": {}, "horizon": 4, "targets": [tgt]}]

    with pytest.raises(ValueError, match="linear_hinge"):
        run_manager(
            spark, _train_only(panel), io,
            cfg_with(regressors=[{"kind": "lag", "col": "sales", "lags": [1]}]),
            group_columns=["region", "store"], order_col="turn_idx",
        )
    with pytest.raises(ValueError, match="linear_hinge"):
        run_manager(
            spark, _train_only(panel), io,
            cfg_with(tuning={"grid": {"knot_frac": [0.4, 0.5]}}),
            group_columns=["region", "store"], order_col="turn_idx",
        )
    with pytest.raises(ValueError, match="linear_hinge"):
        run_manager(
            spark, _train_only(panel), io, cfg_with(),
            group_columns=["region", "store"], order_col="turn_idx",
            run_mode="fit",
        )
    with pytest.raises(ValueError, match="unknown forecaster"):
        run_manager(
            spark, _train_only(panel), io,
            [{"unit": {}, "horizon": 4,
              "targets": [{"target_col": "sales",
                           "model": {"forecaster": "prophet"}}]}],
            group_columns=["region", "store"], order_col="turn_idx",
        )


def test_run_manager_ephemeral_matches_persisted(spark, panel, tmp_path):
    """PipelineConfig(ephemeral=True) skips snapshot/lineage/read-back but
    produces the identical forecast rows as a persisted run (the one-shot
    optimization path must not change a single value)."""
    train = _train_only(panel)
    io_p = TableIO(str(tmp_path / "wh_persist"))
    res_p = run_manager(
        spark, train, io_p, CONFIG, group_columns=["region", "store"],
        cfg=PipelineConfig(num_buckets=4),
    )
    io_e = TableIO(str(tmp_path / "wh_ephemeral"))
    res_e = run_manager(
        spark, train, io_e, CONFIG, group_columns=["region", "store"],
        cfg=PipelineConfig(num_buckets=4, ephemeral=True),
    )
    assert res_e.forecast_frames and not res_e.forecast_tables
    # nothing was written under the ephemeral warehouse
    import os

    assert not any(
        name.startswith("mgr_") for name in os.listdir(str(tmp_path / "wh_ephemeral"))
    ) if os.path.isdir(str(tmp_path / "wh_ephemeral")) else True
    cols = ["_unit_id", "target", "step", "yhat"]
    got_p = (
        res_p.forecasts(spark, io_p).select(*cols).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    got_e = (
        res_e.forecasts(spark, io_e).select(*cols).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_p, got_e)


def test_run_manager_ephemeral_rejects_fit(spark, panel, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="ephemeral"):
        run_manager(
            spark, _train_only(panel), io, CONFIG,
            group_columns=["region", "store"], run_mode="fit",
            cfg=PipelineConfig(num_buckets=4, ephemeral=True),
        )
