"""Second wave of TPC-H-shaped analytics over the testdata star schema —
the shapes round 1 left uncovered, adapted to the columns this schema
actually has (no partsupp / commitdate / receiptdate / shipmode; proxies
noted per query).

* q157 — Q7 shape: bidirectional trade volume between two nations by year
  (fact⋈fact shuffle on orderkey; both nation dims broadcast).
* q158 — Q9 shape: product-line profit by supplier nation × year, with
  ``0.6 × p_retailprice × l_quantity`` standing in for ps_supplycost.
* q159 — Q12 shape: ship-delay service classes per order priority
  (l_shipdate − o_orderdate > 90 days stands in for receipt/commit lag).
* q160 — Q14 shape: promo revenue share per month (conditional ratio).
* q161 — Q19 shape: disjunctive (brand, size-range, qty-range) triplets —
  an OR-of-ANDs mixed join/filter predicate Catalyst must keep pushable.
* q162 — Q2 shape: min-observed-cost supplier per European part, with the
  per-(part,supplier) min l_extendedprice standing in for partsupp;
  decorrelated as groupBy-min + join-back instead of a correlated subquery.

Reference parity: the reference has no multi-join analytics at all (its
only join is feature-table⋈gold in src/data/gold.py); these exist for the
harness star schema per SURVEY §2.3/§7.2.

Scale notes: every query broadcasts its dims and shuffles facts on join
keys only; q161's disjunction stays a single lineitem scan (no union of
three scans); q162's argmin is one shuffle on (partkey) after a map-side
partial min on (partkey, suppkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register
from pyspark_anomaly_detection_spark.relational.tpch import revenue


@register(
    "q157_nation_trade_flows",
    oracle="""
    SELECT
      supp_nation,
      cust_nation,
      l_year,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM (
      SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        l_extendedprice,
        l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q157_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two trading nations, both
    directions, by ship year.  The disjunctive nation-pair predicate is
    applied AFTER both dim joins (it spans both sides); each nation dim is
    broadcast, so the only shuffles are the two fact⋈fact joins on
    l_orderkey / o_custkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q158_product_line_profit",
    oracle="""
    SELECT
      n_name AS nation,
      CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(0.6 AS DECIMAL(3,1))
                 * CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q158_product_line_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on one product line ('%gear%' parts) by supplier
    nation and order year.  ps_supplycost doesn't exist in this schema;
    0.6 × p_retailprice × l_quantity is the documented stand-in, kept in
    DECIMAL end-to-end so both engines sum exactly.  part is filtered
    before the join (pushed to its scan) and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit_term = revenue() - (
        F.lit("0.6").cast("decimal(3,1)") * dec2("p_retailprice") * dec2("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit_term.alias("profit_term"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit_term").cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q159_ship_delay_service_classes",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) > 90
               THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
      CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) <= 90
               THEN 1 ELSE 0 END) AS BIGINT) AS ontime_items
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q159_ship_delay_service_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: items split into late/on-time service classes per order
    priority.  The schema has no shipmode/commit/receipt dates, so the
    class predicate is ship lag (l_shipdate − o_orderdate > 90 days) —
    same conditional-count-over-join shape.  One shuffle (orderkey join);
    the priority agg rides the same exchange output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_items"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_items"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q160_promo_revenue_share",
    oracle="""
    SELECT
      STRFTIME(DATE_TRUNC('month', l_shipdate), '%Y-%m') AS ship_month,
      CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_share_pct,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def q160_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: monthly % of revenue from PROMO-type parts.  Both sums
    are exact DECIMAL; the share is one identical IEEE-754
    (100·promo)/total division in both engines.  part is broadcast; one
    shuffle on the month grouping."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    promo_rev = F.sum(
        F.when(F.col("p_type") == "PROMO", revenue()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    total_rev = F.sum(revenue()).cast("double")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .groupBy("ship_month")
        .agg(
            (F.lit(100.0) * promo_rev / total_rev).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
        .orderBy("ship_month")
    )


@register(
    "q161_disjunctive_basket_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 25 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q161_disjunctive_basket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue matched by an OR of three (brand, size-range,
    quantity-range) baskets.  Expressed as ONE join + one disjunctive
    predicate — Catalyst splits the part-only conjuncts out of the OR and
    pushes the derivable brand/size envelope to the part scan; the
    lineitem scan is never tripled."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    basket = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 35)
    ) | (
        (F.col("p_brand") == "Brand#33")
        & F.col("p_size").between(25, 50)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 50)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(basket)
        .agg(
            F.sum(revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q162_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
      FROM lineitem
      GROUP BY sp_partkey, sp_suppkey
    ),
    euro_supply AS (
      SELECT sp_partkey, sp_suppkey, supply_cost,
             s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name
      FROM supply
      JOIN supplier ON s_suppkey = sp_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT sp_partkey, MIN(supply_cost) AS best_cost
      FROM euro_supply
      GROUP BY sp_partkey
    )
    SELECT
      p_partkey, p_name,
      CAST(best_cost AS DOUBLE) AS best_cost,
      s_name, s_acctbal, n_name
    FROM euro_supply
    JOIN best ON euro_supply.sp_partkey = best.sp_partkey
             AND euro_supply.supply_cost = best.best_cost
    JOIN part ON p_partkey = euro_supply.sp_partkey
    WHERE p_size BETWEEN 20 AND 30
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY p_partkey ORDER BY s_acctbal DESC, s_name
    ) = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q162_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each mid-size part, the European supplier offering it
    cheapest (observed min l_extendedprice per (part, supplier) stands in
    for partsupp).  Decorrelated: the per-part MIN is a groupBy + join
    back on (partkey, cost) — no correlated subquery, one extra shuffle —
    and cost ties resolve deterministically by (s_acctbal DESC, s_name)
    row_number.  The supplier⋈nation⋈region dim stack is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(20, 30))

    supply = li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min(dec2("l_extendedprice")).alias("supply_cost"))

    euro_dims = F.broadcast(
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey")).join(
            region, F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    euro_supply = supply.join(
        euro_dims, F.col("s_suppkey") == F.col("sp_suppkey")
    ).select(
        "sp_partkey",
        "supply_cost",
        "s_name",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        "n_name",
    )
    # per-part MIN as a window aggregate instead of groupBy + join-back:
    # the join-back referenced euro_supply twice, replaying the lineitem
    # aggregation per leg (PLAN_AUDIT round 3: lineitem×2, 9 scans, 6
    # shuffles; now each table scans once) — the window reuses the one
    # hash-partitioning by part key.
    w_min = Window.partitionBy("sp_partkey")
    w = Window.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"), F.asc("s_name"))
    return (
        euro_supply.withColumn("best_cost", F.min("supply_cost").over(w_min))
        .filter(F.col("supply_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("sp_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("best_cost").cast("double").alias("best_cost"),
            "s_name",
            "s_acctbal",
            "n_name",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---- round-6 wave: the last three uncovered TPC-H shapes (Q6/Q13/Q16)


@register(
    "q186_forecast_revenue_change",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        AS revenue_increase,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1997
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q186_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that WOULD have been earned had small-quantity
    discounts in a band been revoked for one year — a pure scan-filter-
    aggregate with a conjunctive triple predicate.  The discount bounds
    compare the RAW doubles (both engines parse 0.05/0.07 to identical
    IEEE values — no decimal rounding inside a predicate), the money sum
    is exact decimal per the suite convention.  Catalyst pushes all
    three conjuncts to the parquet scan; no shuffle at all beyond the
    final scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.year("l_shipdate") == 1997)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec2("l_extendedprice") * dec2("l_discount"))
        .cast("double")
        .alias("revenue_increase"),
        F.count("*").alias("n_items"),
    )


@register(
    "q187_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COALESCE(n, 0) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders
        WHERE o_orderpriority <> '1-URGENT'
        GROUP BY o_custkey
      ) ON o_custkey = c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q187_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts INCLUDING
    zero-order customers (the outer-join shape; priority filter stands
    in for the comment NOT LIKE).  Aggregate-then-join: orders reduce to
    (custkey, n) via a partially-aggregated groupBy BEFORE touching
    customer, so the left join carries one row per customer-with-orders
    instead of one per order — at 100 TB that is the difference between
    joining a fact and joining a key-count table.  Customers with no
    match coalesce to 0; the second groupBy is over ≤ max-order-count
    distinct values."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    per_cust = cust.join(
        counts, cust["c_custkey"] == counts["o_custkey"], "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q188_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q188_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can deliver each qualifying
    (brand, type, size) — observed (partkey, suppkey) pairs from lineitem
    stand in for partsupp, negative-balance suppliers for the complaints
    NOT IN.  The NOT IN decorrelates to a broadcast LEFT ANTI join (the
    excluded set is tiny); the part predicate trio is broadcast with the
    dim; distinct-pairs reduce lineitem BEFORE the join so the exchange
    carries (partkey, suppkey) longs only."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        ps.join(F.broadcast(bad), ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
