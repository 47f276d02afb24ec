"""Relational core: scans, filters, projections, joins, aggregations, sorts.

Covers SURVEY.md §2.2 (P1-P10), §2.3 (join suite), §2.4 (A1-A3), §2.6 (O1 +
top-k), §2.8 (scalar functions F1-F9) — re-expressed on the driver's star
schema.  The gold-layer aggregation shapes mirror the reference
(``src/data/gold.py:31-53``) transplanted to ``orders``/``events``.

Scale notes (100 TB design point):

* Dimension joins (region/nation/supplier) are explicitly ``broadcast()`` —
  they stay small at any SF, so no shuffle of the fact table.
* Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE handles
  skew.  At cluster scale both sides would be bucketed by orderkey to make
  this a co-located join.
* Filters are plain column predicates on scan columns → pushed into the
  Parquet reader (verify: ``PushedFilters`` in ``explain``).
* Top-k uses ``orderBy().limit()`` → Spark plans ``TakeOrderedAndProject``
  (per-partition heap + driver merge; no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import (
    avg_dbl,
    dec2,
    fmt_date,
    sum_dbl,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan-filter-agg-sort, the classic
# whole-stage-codegen pipeline.  Reference analogue: gold daily aggregation
# (src/data/gold.py:31-41) — multi-agg with derived post-agg columns.
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
        AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
        AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # the scale-4/6 product sums REDUCE to scale 2 (ROUND half-up, same
    # as DuckDB's ROUND half-away) before the double cast: at sf1 the
    # scale-6 sum's scaled integer exceeds 2^53, where DuckDB's
    # int128→double path double-rounds while Spark's BigDecimal
    # single-rounds — a 1-ulp divergence PARITY_sf1 caught (round 14);
    # at scale 2 the scaled integer stays exact in double far past sf100
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    charge = disc_price * (F.lit(1) + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_dbl("l_quantity").alias("sum_qty"),
            sum_dbl("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            avg_dbl("l_quantity").alias("avg_qty"),
            avg_dbl("l_extendedprice").alias("avg_price"),
            avg_dbl("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q2 — top revenue orders (TPC-H Q3 shape): 3-way join + agg + top-k.
# --------------------------------------------------------------------------


@register(
    "q02_top_revenue_orders",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            fmt_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q3 — region revenue (TPC-H Q5 shape): 5-way join with broadcast dims.
# --------------------------------------------------------------------------


@register(
    "q03_region_revenue",
    oracle="""
    SELECT
      r_name,
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    headline=True,
)
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    # region/nation stay tiny at any SF → broadcast; customer⋈orders⋈lineitem
    # shuffle on their keys (bucketing candidates at cluster scale).
    dims = F.broadcast(region.join(nation, F.col("n_regionkey") == F.col("r_regionkey")))
    return (
        cust.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q4 — daily order summary: the reference's gold daily aggregation
# (src/data/gold.py:31-41) on orders: count / distinct / volume / ratio.
# --------------------------------------------------------------------------


@register(
    "q04_daily_order_summary",
    oracle="""
    SELECT
      strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      COUNT(*) AS total_orders,
      COUNT(DISTINCT o_custkey) AS distinct_customers,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_volume,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*) AS urgent_rate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY order_date
    ORDER BY order_date
    """,
    headline=True,
)
def q04_daily_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy(fmt_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").alias("total_orders"),
            F.countDistinct("o_custkey").alias("distinct_customers"),
            sum_dbl("o_totalprice").alias("total_volume"),
            avg_dbl("o_totalprice").alias("avg_order_value"),
            F.sum(urgent).alias("urgent_orders"),
            (F.sum(urgent).cast("double") / F.count("*")).alias("urgent_rate"),
        )
        .orderBy("order_date")
    )


# --------------------------------------------------------------------------
# Q5 — filter + projection: pushed-down range predicates (P4/P5), derived
# columns (P10), cast (P7).  Verify pushdown: PushedFilters in explain().
# --------------------------------------------------------------------------


@register(
    "q05_filter_project",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity AS INT) AS qty_int,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
      strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
      AND l_quantity > 45
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q05_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty_int"),
            (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount")))
            .cast("double")
            .alias("net_price"),
            fmt_date("l_shipdate").alias("ship_date"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Q6 — conditional projection + datetime scalars (P6, F1-F5): the silver
# layer's derived time columns (src/data/silver.py:32-38) on events.
# NB Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6.
# --------------------------------------------------------------------------


@register(
    "q06_weekend_flag",
    oracle="""
    SELECT
      dayofweek(ts) + 1 AS day_of_week,
      CASE WHEN dayofweek(ts) + 1 IN (1, 7) THEN 1 ELSE 0 END AS is_weekend,
      hour(ts) AS txn_hour,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
)
def q06_weekend_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dow = F.dayofweek("ts")
    return (
        ev.select(
            dow.alias("day_of_week"),
            F.when(dow.isin(1, 7), 1).otherwise(0).alias("is_weekend"),
            F.hour("ts").alias("txn_hour"),
            "value",
        )
        .groupBy("day_of_week", "is_weekend", "txn_hour")
        .agg(
            F.count("*").alias("n_events"),
            sum_dbl("value").alias("total_value"),
        )
        .orderBy("day_of_week", "txn_hour")
    )


# --------------------------------------------------------------------------
# Q7 — null handling (P1/P8/P9): nullif → fillna/coalesce round-trip.
# The testdata has no nulls, so we manufacture them with NULLIF — same
# operator surface as the reference's fillna calls (src/data/silver.py:38,
# src/models/train.py:31-33).
# --------------------------------------------------------------------------


@register(
    "q07_null_handling",
    oracle="""
    WITH e AS (
      SELECT
        COALESCE(NULLIF(event_type, 'error'), 'none') AS type_filled,
        CASE WHEN value > 250 THEN NULL ELSE value END AS value_capped
      FROM events
    )
    SELECT
      type_filled,
      COUNT(*) AS n_rows,
      COUNT(value_capped) AS n_nonnull,
      CAST(SUM(CAST(COALESCE(value_capped, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_filled
    FROM e
    GROUP BY type_filled
    ORDER BY type_filled
    """,
)
def q07_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    capped = F.when(F.col("value") > 250, F.lit(None)).otherwise(F.col("value"))
    prepared = ev.select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_filled"),
        capped.alias("value_capped"),
    ).fillna({"type_filled": "none"})
    return (
        prepared.groupBy("type_filled")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("value_capped").alias("n_nonnull"),
            F.sum(dec2(F.coalesce(F.col("value_capped"), F.lit(0.0))))
            .cast("double")
            .alias("sum_filled"),
        )
        .orderBy("type_filled")
    )


# --------------------------------------------------------------------------
# Q8 — JSON extraction (events.props is a JSON string): get_json_object.
# --------------------------------------------------------------------------


@register(
    "q08_json_extract",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      COUNT(*) AS n_events,
      CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
)
def q08_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_mod")
    )


# --------------------------------------------------------------------------
# Q9 — semi/anti joins (SURVEY §2.3): high-value customers with/without
# recent orders.  left_semi/left_anti never widen rows → no fact shuffle of
# the probe side's payload columns.
# --------------------------------------------------------------------------


@register(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 9000
      AND c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    ORDER BY c_custkey
    """,
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q11 — explicit broadcast dimension join (SURVEY §2.3): nation/region are
# broadcast at any SF → the fact side never shuffles for the join.
# --------------------------------------------------------------------------


@register(
    "q11_broadcast_dim_join",
    oracle="""
    SELECT
      r_name,
      COUNT(*) AS n_customers,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q11_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            sum_dbl("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Q12 — theta/range join (SURVEY §2.3): equi key + range residual predicate
# ("shipped ≥ 90 days after order").  The equi component keeps this a
# hash/sort-merge join with a residual filter — not a cartesian product.
# --------------------------------------------------------------------------


@register(
    "q12_range_join",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(*) AS late_items,
      COUNT(DISTINCT o_orderkey) AS late_orders
    FROM orders
    JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q12_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("late_items"),
            F.countDistinct("o_orderkey").alias("late_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q13 — global aggregate stats (A3 + countDistinct/min/max from §2.4).
# --------------------------------------------------------------------------


@register(
    "q13_global_stats",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
      strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship,
      CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    """,
)
def q13_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        fmt_date(F.min("l_shipdate")).alias("first_ship"),
        fmt_date(F.max("l_shipdate")).alias("last_ship"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        sum_dbl("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Q14/Q15 — rollup & cube (multi-level aggregation, SURVEY §2.4 extension).
# Rolled-up levels produce NULL group keys → COALESCE to 'ALL' on both
# sides so hashing is stable.
# --------------------------------------------------------------------------


@register(
    "q14_rollup_region_nation",
    oracle="""
    SELECT
      COALESCE(r_name, 'ALL') AS region_name,
      COALESCE(n_name, 'ALL') AS nation_name,
      COUNT(*) AS n_customers,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def q14_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey")).join(
        region, F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            sum_dbl("c_acctbal").alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "q15_cube_status_priority",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS volume
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q15_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            sum_dbl("o_totalprice").alias("volume"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "volume",
        )
        .orderBy("status", "priority")
    )


# --------------------------------------------------------------------------
# Q16 — top-k per group (ranking window): top 3 orders per market segment.
# --------------------------------------------------------------------------


@register(
    "q16_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk
    FROM (
      SELECT
        c_mktsegment,
        o_orderkey,
        o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY c_mktsegment
          ORDER BY o_totalprice DESC, o_orderkey
        ) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)
def q16_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


# --------------------------------------------------------------------------
# Q17 — string functions over documents (SURVEY §2.8 extension).
# --------------------------------------------------------------------------


@register(
    "q17_string_funcs",
    oracle="""
    SELECT
      source,
      COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS n_spark_docs,
      CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens,
      MIN(upper(substr(lang, 1, 2))) AS first_lang
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q17_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("text").rlike("spark"), 1).otherwise(0)).alias(
                "n_spark_docs"
            ),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens"),
            F.min(F.upper(F.substring("lang", 1, 2))).alias("first_lang"),
        )
        .orderBy("source")
    )
