"""Skew machinery: salt buckets, hot-key sub-splitting, per-series kernel."""

import pandas as pd
from pyspark.sql import functions as F

from mpnsm_spark.operators.rollup import merge_partials, rollup_raw
from mpnsm_spark.operators.skew import (
    apply_per_series,
    conv_sizes,
    with_salt,
    with_sub_splits,
)

from .oracle_pandas import compare_frames

FLOATS = ("value_sum", "value_min", "value_max", "value_avg", "first_value", "last_value")


def test_salt_stable_and_bounded(transcripts):
    df = with_salt(transcripts, 8)
    stats = df.groupBy("conv_id").agg(F.countDistinct("bucket_id").alias("nb")).toPandas()
    assert (stats["nb"] == 1).all()  # one bucket per conversation
    ids = df.select("bucket_id").distinct().toPandas()["bucket_id"]
    assert ids.between(0, 7).all()


def test_sub_splits_bound_group_size(transcripts):
    sub = with_sub_splits(transcripts, split_threshold=50)
    sizes = sub.groupBy("conv_id", "sub_id").count().toPandas()
    assert (sizes["count"] <= 50).all()
    # cold conversations keep a single group
    cold = conv_sizes(transcripts).filter(F.col("n_turns") <= 50)
    cold_subs = sub.join(cold, "conv_id", "left_semi").select("sub_id").distinct()
    assert cold_subs.toPandas()["sub_id"].tolist() == [0]


def test_sub_splits_timestamp_order_col(transcripts):
    """Non-numeric order_col (timestamp): the rank-window path still bounds
    every (conv, sub) group and keeps cold conversations unsplit (ADVICE r3:
    the numeric-division path raised DATATYPE_MISMATCH for the tier tables'
    ``bucket_start`` default)."""
    sub = with_sub_splits(transcripts, split_threshold=50, order_col="ts")
    sizes = sub.groupBy("conv_id", "sub_id").count().toPandas()
    assert (sizes["count"] <= 50).all()
    cold = conv_sizes(transcripts).filter(F.col("n_turns") <= 50)
    cold_subs = sub.join(cold, "conv_id", "left_semi").select("sub_id").distinct()
    assert cold_subs.toPandas()["sub_id"].tolist() == [0]
    assert sub.count() == transcripts.count()  # row multiset preserved


def test_schema_column_names_commas_in_types(spark):
    """DDL parsing must survive comma-bearing types (ADVICE r3)."""
    from mpnsm_spark.operators.skew import _schema_column_names

    ddl = (
        "conv_id string, amt decimal(20,6), props map<string,int>, "
        "s struct<a:int,b:string>"
    )
    assert _schema_column_names(ddl) == ["conv_id", "amt", "props", "s"]


def test_per_series_kernel_with_split_matches_unsplit(spark, transcripts):
    """A per-series rollup kernel run with hot-key splitting + associative
    re-merge equals the plain SQL rollup (split safety end-to-end)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n": [len(pdf)],
                "vsum": [float(pdf["value"].sum())],
            }
        )
        return out

    schema = "conv_id string, n long, vsum double"
    split = apply_per_series(
        transcripts, kernel, schema, split_threshold=40
    )
    merged = split.groupBy("conv_id").agg(
        F.sum("n").alias("n"), F.sum("vsum").alias("vsum")
    )
    expected = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("vsum")
    )
    a = merged.toPandas().sort_values("conv_id").reset_index(drop=True)
    b = expected.toPandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_split_rollup_remerge(transcripts):
    """Tier rollup of sub-split raw + merge_partials == unsplit rollup."""
    sub = with_sub_splits(transcripts, split_threshold=30)
    parts = rollup_raw(sub.drop("sub_id"), "1h")  # sanity: dropping split is the same df
    full = rollup_raw(transcripts, "1h").toPandas()
    merged = merge_partials(parts).toPandas()
    compare_frames(merged, full, ["conv_id", "bucket_start"], float_cols=FLOATS)


def test_batch_buckets_matches_per_series(spark, transcripts):
    """Bucket-batched kernels must emit exactly the per-series results."""
    import pandas as pd

    from mpnsm_spark.operators.skew import apply_per_series

    df = transcripts.select("conv_id", "turn_idx", "value")

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n": [len(pdf)],
                "first_v": [float(pdf["value"].iloc[0])],
            }
        )

    schema = "conv_id string, n bigint, first_v double"
    plain = apply_per_series(df, kern, schema).orderBy("conv_id").collect()
    batched = (
        apply_per_series(df, kern, schema, batch_buckets=4)
        .orderBy("conv_id")
        .collect()
    )
    assert plain == batched


def test_batch_buckets_error_isolation(spark, transcripts):
    """on_error='skip' must poison only the failing series inside a batch."""
    import pandas as pd

    from mpnsm_spark.operators.skew import apply_per_series

    df = transcripts.select("conv_id", "turn_idx", "value")
    poison = df.select("conv_id").distinct().orderBy("conv_id").first()[0]

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["conv_id"].iloc[0] == poison:
            raise RuntimeError("boom")
        return pd.DataFrame({"conv_id": [pdf["conv_id"].iloc[0]]})

    acc = spark.sparkContext.accumulator(0)
    out = apply_per_series(
        df,
        kern,
        "conv_id string",
        batch_buckets=4,
        on_error="skip",
        error_acc=acc,
    ).collect()
    got = {r[0] for r in out}
    everyone = {r[0] for r in df.select("conv_id").distinct().collect()}
    assert got == everyone - {poison}
    assert acc.value == 1


def test_batch_buckets_null_key_and_clean_columns(spark):
    """ADVICE r4: the batched path must (a) run the kernel on null-key groups
    exactly like the non-batched Spark groupBy path does, and (b) never leak
    the _batch_id helper column into the kernel's input frame."""
    import pandas as pd

    from mpnsm_spark.operators.skew import apply_per_series

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), (None, 0, 5.0), (None, 1, 7.0)],
        "conv_id string, turn_idx int, value double",
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        assert list(pdf.columns) == ["conv_id", "turn_idx", "value"]
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "vsum": [float(pdf["value"].sum())],
            }
        )

    schema = "conv_id string, vsum double"
    plain = {
        (r["conv_id"], r["vsum"])
        for r in apply_per_series(df, kern, schema).collect()
    }
    batched = {
        (r["conv_id"], r["vsum"])
        for r in apply_per_series(df, kern, schema, batch_buckets=4).collect()
    }
    assert plain == batched == {("a", 3.0), (None, 12.0)}


def test_batch_buckets_auto_resolves(spark, transcripts):
    """batch_buckets='auto' derives 2×defaultParallelism at call time and
    produces per-series-identical results."""
    import pandas as pd

    from mpnsm_spark.operators.skew import apply_per_series

    df = transcripts.select("conv_id", "turn_idx", "value")

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"conv_id": [pdf["conv_id"].iloc[0]], "n": [len(pdf)]})

    schema = "conv_id string, n bigint"
    auto = apply_per_series(df, kern, schema, batch_buckets="auto")
    # the resolved bucket count shows up as the shuffle partition count
    assert auto.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism
    plain = apply_per_series(df, kern, schema).orderBy("conv_id").collect()
    assert auto.orderBy("conv_id").collect() == plain
