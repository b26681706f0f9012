"""Explicit skew handling for per-conversation grouped work.

The reference load-balances only via "many series × n_jobs workers"
(``/root/reference/mpnsm/time_series/manager.py:308-313``); one giant series
stalls a worker — the same pathology as a hot ``conv_id`` in a
``groupBy(conv_id).applyInPandas`` stage, which AQE cannot split
(SURVEY.md §4). This module makes the skew strategy explicit:

1. **salt buckets** — ``bucket_id = pmod(xxhash64(conv_id), B)`` distributes
   conversations across B buckets for lineage/commit granularity and for
   pre-shuffle balance;
2. **hot-conversation sub-splitting** — a size pre-pass finds conversations
   above ``split_threshold`` turns; only those are split into bounded
   ``sub_id`` ranges by ``turn_idx``, so every grouped-map group is
   ≤ threshold rows. Results are re-merged by an associative combine
   (e.g. ``rollup.merge_partials``) — safe for all tier columns by design.

Everything here is declarative Spark SQL; the only custom piece is the
``apply_per_series`` wrapper, the engine's analog of mpnsm's per-series
parallel fitting loop (SURVEY.md §2.10 F1).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_buckets: int, key: str = "conv_id") -> DataFrame:
    """Stable salt bucket per key: pmod(xxhash64(key), B)."""
    return df.withColumn(
        "bucket_id", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    )


def fan_out(df: DataFrame, key: str, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow-parallelism input across the cluster BEFORE per-row
    expensive work (heavy expressions, higher-order functions, Python
    kernels).

    A single unsplittable input (one parquet row group, a gzip file, a small
    dimension table) plans as a 1-task scan, serializing everything that runs
    before the first exchange — the input-skew case of the optimization
    playbook ("one huge unsplittable file: repartition immediately after the
    read"). This repartitions by ``pmod(xxhash64(key), n)`` — DETERMINISTIC
    (retried tasks reproduce the same placement; round-robin repartition of
    non-deterministic input can duplicate/lose rows, SPARK-38388) — and only
    when the current plan has fewer partitions than ``min_partitions``
    (default ``sparkContext.defaultParallelism``). At production scale the
    scan already has hundreds of splits and this is a structural no-op: no
    shuffle is added.

    Laziness note: the partition-count probe uses ``df.rdd``, which under
    AQE EXECUTES any exchange already in the plan at build time (a real
    Spark job, re-run again at action time). So a frame whose optimized
    plan already contains a repartition — e.g. the output of an operator
    that fanned out internally — is returned unchanged WITHOUT probing:
    composition stays lazy and the double-execution cannot happen. The
    probe only runs for exchange-free plans (scans/projections), where
    ``.rdd`` is planning-only.
    """
    sc = df.sparkSession.sparkContext
    n = min_partitions or sc.defaultParallelism
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    if "Repartition" in plan or "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, F.col(key))


def conv_sizes(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Size pre-pass (reference: empty-series pruning / load balance,
    ``deprecated/ts_manager.py:215-216``)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n_turns"))


def with_sub_splits(
    df: DataFrame,
    split_threshold: int,
    key: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Add ``sub_id`` splitting only hot keys into ≤ threshold-row ranges.

    Cold conversations get sub_id=0 (single group, no behavior change). The
    size pre-pass result is broadcast — it is tiny (one row per conversation
    above threshold).

    For a NUMERIC ``order_col`` (the dense 0-based ``turn_idx``) the sub-range
    is ``order_col // threshold`` — a pure map-side projection. For any other
    type (e.g. the tier tables' ``bucket_start`` timestamp — ADVICE r3:
    dividing a timestamp raises DATATYPE_MISMATCH at analysis) a per-key rank
    window computes the dense index; the window runs over the HOT rows only,
    so its sort cost is bounded by the (few, by definition) hot conversations
    and cold rows stay on the map-only path.
    """
    hot = (
        conv_sizes(df, key)
        .filter(F.col("n_turns") > split_threshold)
        .select(key, F.lit(True).alias("_is_hot"))
    )
    joined = df.join(F.broadcast(hot), key, "left")
    numeric_types = {"tinyint", "smallint", "int", "bigint", "long", "float", "double"}
    dtype = dict(df.dtypes).get(order_col, "")
    if dtype in numeric_types or dtype.startswith("decimal"):
        return joined.withColumn(
            "sub_id",
            F.when(
                F.col("_is_hot").isNotNull(),
                (F.col(order_col) / F.lit(split_threshold)).cast("long"),
            ).otherwise(F.lit(0)),
        ).drop("_is_hot")
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    cold = joined.filter(F.col("_is_hot").isNull()).withColumn(
        "sub_id", F.lit(0).cast("long")
    )
    hot_rows = joined.filter(F.col("_is_hot").isNotNull()).withColumn(
        "sub_id",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(split_threshold)).cast("long"),
    )
    return cold.unionByName(hot_rows).drop("_is_hot")


def _schema_column_names(output_schema) -> list[str]:
    # Parse DDL strings with the real parser: naive comma-splitting breaks on
    # types that contain commas — decimal(20,6), map<string,int>, struct<...>
    # (ADVICE r3).
    if isinstance(output_schema, str):
        from pyspark.sql.types import StructType

        return StructType.fromDDL(output_schema).fieldNames()
    return [f.name for f in output_schema.fields]


def apply_per_series(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema,
    split_threshold: int | None = None,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    on_error: str = "raise",
    error_acc=None,
    batch_buckets: int | str | None = None,
) -> DataFrame:
    """Run a pandas kernel once per conversation — mpnsm's flagship operator
    (per-series joblib loop → ``groupBy(conv_id).applyInPandas``).

    ``fn`` receives the group's rows sorted by ``order_col`` and must return a
    DataFrame matching ``output_schema`` **plus carry the key column through**.
    With ``split_threshold``, hot conversations are sub-split and ``fn`` runs
    per (conv, sub-range) — only safe when the caller's downstream re-merge is
    associative (tier rollups are; arbitrary kernels may not be).

    Per-series error isolation (reference: a failed series returns an empty
    frame instead of failing the job, ``/root/reference/mpnsm/time_series/
    deprecated/ts_model.py:1258-1260``): with ``on_error="skip"`` a kernel
    exception yields an empty result for that series only; pass an
    ``error_acc`` (``spark.sparkContext.accumulator(0)``) to count poisoned
    series so the driver can emit ``status='error'`` lineage rows.

    ``batch_buckets`` amortizes the per-group Arrow/Python round-trip for
    workloads of MANY SMALL series (applyInPandas pays one Arrow transfer and
    one Python invocation per group — pure overhead when groups are tiny):
    the shuffle key becomes ``pmod(xxhash64(key), batch_buckets)`` and the
    kernel wrapper loops series inside one batch with a pandas groupby, so
    per-series semantics (sort by ``order_col``, per-series error isolation,
    null-key groups) are preserved exactly while Python is invoked
    ~#series/batch_buckets times less. Pass the string ``"auto"`` (the public
    operators' default) to derive ``2 × defaultParallelism`` at call time —
    a hardcoded count would cap grouped-map parallelism on large clusters
    (ADVICE r4); 2× leaves headroom for the ~1/e empty-partition rate hash
    collisions produce at B≈#tasks. Mutually exclusive with
    ``split_threshold`` (hot-series splitting implies groups are big, the
    opposite regime).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    empty_cols = _schema_column_names(output_schema)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from mpnsm_spark.functions.arrowcfg import tame_arrow_threads

        tame_arrow_threads()
        try:
            return fn(pdf.sort_values(order_col).reset_index(drop=True))
        except Exception:
            if on_error == "raise":
                raise
            if error_acc is not None:
                error_acc.add(1)
            return pd.DataFrame(columns=empty_cols)

    if batch_buckets == "auto":
        batch_buckets = 2 * df.sparkSession.sparkContext.defaultParallelism
    if batch_buckets is not None:
        if split_threshold is not None:
            raise ValueError("batch_buckets and split_threshold are exclusive")

        def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            from mpnsm_spark.functions.arrowcfg import tame_arrow_threads

            tame_arrow_threads()
            # dropna=False: pandas groupby silently drops null-key groups by
            # default, but the non-batched Spark groupBy(key) path DOES run
            # the kernel on the null group — keep the two paths semantically
            # identical (ADVICE r4). The helper _batch_id column is dropped
            # before the kernel sees the group, so fn receives exactly the
            # columns the non-batched path would pass.
            pdf = pdf.drop(columns=["_batch_id"])
            outs = []
            for _, g in pdf.groupby(key, sort=False, dropna=False):
                try:
                    r = fn(g.sort_values(order_col).reset_index(drop=True))
                except Exception:
                    if on_error == "raise":
                        raise
                    if error_acc is not None:
                        error_acc.add(1)
                    continue
                if len(r):  # zero-row frames would upcast dtypes in concat
                    outs.append(r)
            if not outs:
                return pd.DataFrame(columns=empty_cols)
            return pd.concat(outs, ignore_index=True)

        batched = df.withColumn(
            "_batch_id",
            F.pmod(F.xxhash64(F.col(key)), F.lit(batch_buckets)).cast("int"),
        )
        # Explicit repartition(batch_buckets): the grouped-map stage's input
        # is usually SMALL in bytes but expensive per row in Python, and AQE
        # coalesces small shuffles down to 1-2 partitions — serializing every
        # kernel call. A user-specified partition count is exempt from AQE
        # coalescing, and groupBy reuses the hash distribution (no second
        # exchange).
        return (
            batched.repartition(batch_buckets, "_batch_id")
            .groupBy("_batch_id")
            .applyInPandas(run_batch, output_schema)
        )

    if split_threshold is None:
        return df.groupBy(key).applyInPandas(run, output_schema)
    sub = with_sub_splits(df, split_threshold, key=key, order_col=order_col)
    return sub.groupBy(key, "sub_id").applyInPandas(run, output_schema).drop("sub_id")
