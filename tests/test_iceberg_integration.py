"""Iceberg-backend integration test — skip-marked in this sandbox.

The sandbox image has no ``iceberg-spark-runtime`` jar and no network to
fetch one, so the parquet+manifest backend (exercised everywhere else in the
suite) stands in. This test is the on-cluster validation of the ICEBERG.md
mapping table: drop a matching ``iceberg-spark-runtime-*.jar`` anywhere under
``$SPARK_HOME/jars`` or point ``MPNSM_ICEBERG_JAR`` at one, and it runs the
real ``iceberg=True`` code paths (append / read / overwrite / snapshot read)
against a local hadoop catalog.
"""

import glob
import os

import pytest

from mpnsm_spark.sources.tableio import TableIO


def _iceberg_jar() -> str | None:
    env = os.environ.get("MPNSM_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    spark_home = os.environ.get("SPARK_HOME")
    candidates = []
    if spark_home:
        candidates += glob.glob(
            os.path.join(spark_home, "jars", "iceberg-spark-runtime*.jar")
        )
    try:  # pip-installed pyspark keeps jars inside the package
        import pyspark

        candidates += glob.glob(
            os.path.join(
                os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar"
            )
        )
    except ImportError:
        pass
    return candidates[0] if candidates else None


JAR = _iceberg_jar()


@pytest.mark.skipif(
    JAR is None,
    reason="no iceberg-spark-runtime jar on this image; "
    "ICEBERG.md documents the mapping to validate on-cluster",
)
def test_iceberg_backend_roundtrip(tmp_path):
    from pyspark.sql import SparkSession

    wh = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-it")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", wh)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
        io = TableIO(wh, iceberg=True, catalog_prefix="it.db.")
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("b", 2, 2.0)], "part string, k int, v double"
        )
        spark.sql(
            "CREATE TABLE IF NOT EXISTS it.db.t (part string, k int, v double) "
            "USING iceberg"
        )
        io.append(df, "t")
        assert io.read(spark, "t").count() == 2
        io.append(df, "t")
        assert io.read(spark, "t").count() == 4
        io.overwrite(df, "t")
        assert io.read(spark, "t").count() == 2
        # snapshot pinning (resume semantics): history table exposes ids
        snaps = spark.sql("SELECT snapshot_id FROM it.db.t.snapshots").collect()
        assert len(snaps) >= 3
    finally:
        spark.stop()
