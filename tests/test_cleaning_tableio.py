"""Cleaning utilities (P7/P9) and TableIO partitioned snapshots (S6)."""

from pyspark.sql import functions as F

from mpnsm_spark.functions.cleaning import (
    all_null_columns,
    binary_columns,
    drop_all_null_columns,
)
from mpnsm_spark.sources.tableio import TableIO


def test_all_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, None)], "a int, b string, c string"
    )
    assert all_null_columns(df) == ["b"]
    assert drop_all_null_columns(df).columns == ["a", "c"]


def test_binary_columns(spark):
    df = spark.createDataFrame(
        [(0, 1, 5, 0.0), (1, 0, 7, 1.0), (0, 1, 9, 0.0)],
        "flag int, dummy int, big int, fflag double",
    )
    assert set(binary_columns(df)) == {"flag", "dummy", "fflag"}


def test_tableio_partitioned_snapshot_roundtrip(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)], "part string, k int, v double"
    )
    io.append(df, "t", partition_by=["part"])
    back = io.read(spark, "t")
    assert back.count() == 3
    assert set(back.columns) == {"part", "k", "v"}
    assert back.filter(F.col("part") == "a").count() == 2
    # second partitioned append unions
    io.append(df.withColumn("v", F.col("v") + 10), "t", partition_by=["part"])
    assert io.read(spark, "t").count() == 6
    assert io.snapshot_version("t") == 2


def test_tableio_rejects_mixed_layout(spark, tmp_path):
    import pytest

    io = TableIO(str(tmp_path / "wh2"))
    df = spark.createDataFrame([("a", 1)], "part string, k int")
    io.append(df, "t")
    with pytest.raises(ValueError, match="cannot mix"):
        io.append(df, "t", partition_by=["part"])
