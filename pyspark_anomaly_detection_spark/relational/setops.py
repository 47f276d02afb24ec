"""Set operations (SURVEY.md §2.7): union / intersect / except.

Absent from the reference (its only in-domain analogue is the silver
train/test split recombination, ``src/data/silver.py:48-59``); exposed here
for oracle coverage.  ``intersect``/``exceptAll`` shuffle on the full row —
keep projections narrow before applying them (column pruning does not cross
a set-op boundary for the distinct-compare itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


@register(
    "q18_union_split",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, 'early' AS split
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 'late' AS split
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT split, o_orderstatus, COUNT(*) AS n_orders
    FROM unioned
    GROUP BY split, o_orderstatus
    ORDER BY split, o_orderstatus
    """,
)
def q18_union_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chronological split (reference src/data/silver.py:44-49) + unionByName."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", F.lit("early").alias("split")
    )
    late = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderstatus", F.lit("late").alias("split")
    )
    return (
        early.unionByName(late)
        .groupBy("split", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("split", "o_orderstatus")
    )


@register(
    "q19_intersect_nations",
    oracle="""
    SELECT n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS n_nationkey FROM supplier
    ) ORDER BY n_nationkey
    """,
)
def q19_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers (INTERSECT = distinct)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    return cust.intersect(supp).orderBy("n_nationkey")


@register(
    "q20_except_nations",
    oracle="""
    SELECT n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS n_nationkey FROM supplier
    ) ORDER BY n_nationkey
    """,
)
def q20_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (EXCEPT = distinct)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    # subtract = EXCEPT DISTINCT (exceptAll is bag semantics — not the same)
    return cust.subtract(supp).orderBy("n_nationkey")
