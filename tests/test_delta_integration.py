"""Delta Lake integration (S6/S7) — activates the moment delta-spark jars
appear in the environment; skips cleanly today (jars absent, VERDICT r1 §
What's missing #1).

The reference's entire storage layer is Delta
(``/root/reference/config/spark_config.py:24-26``,
``src/data/silver.py:56``); the engine's writers are format-pluggable
(``io/writers.py``), so these tests exercise exactly that pluggability:
partitioned Delta writes, schema-evolution overwrite, time travel, and
MERGE — the transactional semantics plain Parquet can't offer.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta", reason="delta-spark not installed in this environment"
)


@pytest.fixture(scope="module")
def delta_spark():
    """A session with the Delta SQL extensions — separate from the shared
    test session because the extensions must be set at build time."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("delta-integration")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_partitioned_delta_write_and_read(delta_spark, tmp_path):
    """S6: the partitioned sink with fmt='delta' (reference
    src/data/silver.py:56 writes silver exactly this way)."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.writers import write_partitioned

    path = str(tmp_path / "tbl")
    df = delta_spark.range(100).withColumn("part", F.col("id") % 4)
    write_partitioned(df, path, ["part"], fmt="delta")
    back = delta_spark.read.format("delta").load(path)
    assert back.count() == 100
    assert back.select("part").distinct().count() == 4


def test_time_travel_versions(delta_spark, tmp_path):
    """Every overwrite is a new version; versionAsOf reads the old one."""
    path = str(tmp_path / "tt")
    delta_spark.range(10).write.format("delta").save(path)
    delta_spark.range(25).write.format("delta").mode("overwrite").save(path)
    v0 = delta_spark.read.format("delta").option("versionAsOf", 0).load(path)
    v1 = delta_spark.read.format("delta").load(path)
    assert v0.count() == 10
    assert v1.count() == 25


def test_overwrite_schema_evolution(delta_spark, tmp_path):
    """S7: overwriteSchema widens the table (the schema-evolving sink)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolve")
    delta_spark.range(5).write.format("delta").save(path)
    delta_spark.range(5).withColumn("extra", F.lit("x")).write.format(
        "delta"
    ).mode("overwrite").option("overwriteSchema", "true").save(path)
    back = delta_spark.read.format("delta").load(path)
    assert "extra" in back.columns


def test_merge_upsert(delta_spark, tmp_path):
    """MERGE INTO — the txn-log capability the Parquet upsert in
    io/upsert.py emulates; here it is native and atomic."""
    from delta.tables import DeltaTable
    from pyspark.sql import functions as F

    path = str(tmp_path / "merge")
    delta_spark.range(10).withColumn("v", F.lit(1)).write.format("delta").save(path)
    updates = delta_spark.range(5, 15).withColumn("v", F.lit(2))
    tbl = DeltaTable.forPath(delta_spark, path)
    (
        tbl.alias("t")
        .merge(updates.alias("u"), "t.id = u.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    out = delta_spark.read.format("delta").load(path)
    assert out.count() == 15
    assert out.filter("v = 2").count() == 10  # 5 updated + 5 inserted
