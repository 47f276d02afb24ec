"""r17 input-layout repair (io/readers): single-row-group big inputs are
hash-repartitioned after the read; the row SET must be identical and the
repair must not fire below the size threshold or on well-laid-out data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import readers
from pyspark_anomaly_detection_spark.io.readers import load_table


@pytest.fixture(scope="module")
def spark():
    from pyspark_anomaly_detection_spark.session import get_spark_session

    return get_spark_session("test-scan-parallelism")


def test_small_tables_not_repartitioned(spark):
    """At the correctness SFs every table sits below the byte threshold:
    the plan must stay a bare scan (no injected Exchange)."""
    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    assert "RepartitionByExpression" not in df._jdf.queryExecution().optimizedPlan().toString()


def test_big_single_row_group_table_repairs_and_preserves_rows(spark, tmp_path):
    """A >threshold single-row-group file must gain scan parallelism with
    an IDENTICAL row multiset."""
    src = str(tmp_path / "wide")
    spark.range(0, 400_000).select(
        F.col("id").alias("k"),
        # random-ish pad defeats parquet compression so the file crosses
        # the byte threshold without millions of rows
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256).alias("pad2"),
    ).coalesce(1).write.parquet(src + "/big.parquet")
    size = readers._path_bytes(src + "/big.parquet")
    assert size >= readers.SCAN_PARALLEL_MIN_BYTES, "fixture must cross threshold"
    assert readers._row_groups(src + "/big.parquet") < 8

    repaired = load_table(spark, src, "big")
    assert "RepartitionByExpression" in repaired._jdf.queryExecution().optimizedPlan().toString()
    assert repaired.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    agg = repaired.agg(
        F.count("*").alias("n"), F.sum("k").alias("s"), F.min("k").alias("lo"), F.max("k").alias("hi")
    ).first()
    assert (agg.n, agg.s, agg.lo, agg.hi) == (400_000, 400_000 * 399_999 // 2, 0, 399_999)


def test_row_group_detection_skips_well_laid_out_input(spark, tmp_path):
    """A multi-file (multi-row-group) input above the byte threshold must
    NOT be re-shuffled — the repair is for row-group-starved layouts only."""
    src = str(tmp_path / "laid")
    spark.range(0, 400_000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256).alias("pad2"),
    ).repartition(16, "k").write.parquet(src + "/big.parquet")
    assert readers._row_groups(src + "/big.parquet") >= 16
    df = load_table(spark, src, "big")
    assert "RepartitionByExpression" not in df._jdf.queryExecution().optimizedPlan().toString()
