"""Bucketed-table co-located join: the 100 TB fact-fact join layout.

Writing both sides bucketed on the join key with the same bucket count
must produce a join plan with NO shuffle exchange — each bucket pair joins
in place — and identical results to the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.io.writers import write_bucketed

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], N_BUCKETS, sort_by=["o_orderkey"]
    )
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], N_BUCKETS, sort_by=["l_orderkey"]
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    return (
        spark.table(b_lineitem)
        .join(
            spark.table(b_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # Disable broadcast so the join strategy at fact-fact scale (sort-merge)
    # is what gets planned; bucketing must then eliminate both exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(bucketed_tables[1])
            .join(
                spark.table(bucketed_tables[0]),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    bucketed = {
        (r.o_orderpriority): (r.n_items, r.sum_qty)
        for r in _joined(spark, bucketed_tables).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.o_orderpriority): (r.n_items, r.sum_qty)
        for r in lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .collect()
    }
    assert bucketed == plain


def test_analyze_stats_reach_the_optimizer(spark, bucketed_tables):
    """ANALYZE TABLE statistics must flow into plan costing — the input
    cost-based join reordering and broadcast selection use at scale."""
    table = bucketed_tables[0]
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table(table)._jdf.queryExecution().optimizedPlan().stats()
        )
        expected = spark.table(table).count()
        assert stats.rowCount().isDefined(), "rowCount missing after ANALYZE"
        assert int(str(stats.rowCount().get())) == expected
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")


def test_bucketed_table_metadata(spark, bucketed_tables):
    detail = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE EXTENDED {bucketed_tables[0]}").collect()
    }
    assert detail.get("Num Buckets") == str(N_BUCKETS)
    assert "o_orderkey" in detail.get("Bucket Columns", "")
