"""TPC-H-shaped analytical queries over the testdata star schema (adapted
to its columns) — the multi-join plans that stress join ordering,
broadcast selection, and partial aggregation at warehouse scale.

Shapes covered (beyond q01-q04's Q1/Q3/pricing family):

* q66 — Q5 shape: region-gated 6-table join with the "local supplier"
  cross-constraint (c_nationkey = s_nationkey).
* q67 — Q10 shape: returned-items revenue, top-20 customers.
* q68 — Q18 shape: large-quantity orders via an aggregated semi-join
  (HAVING subquery → broadcast semi-join on the qualifying keys).
* q69 — Q8 shape: yearly market share of one nation's suppliers as a
  conditional-aggregation ratio.

Scale notes: dims (region/nation, and per-query small sides like the
qualifying-orderkey set) are broadcast; fact⋈fact joins shuffle on their
keys — the bucketed-layout variant (io.writers.write_bucketed) removes
even those exchanges for the recurring nightly versions of these queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

def revenue():
    """Exact per-item revenue: extendedprice x (1 - discount) in DECIMAL."""
    return dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))


@register(
    "q66_local_supplier_volume",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q66_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue delivered by suppliers located in the customer's
    own nation, Asian nations only.  The region→nation filter is applied
    BEFORE joining facts (predicate pushdown through the broadcast dim),
    so the fact join only sees Asian customers."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = F.broadcast(
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.join(asian_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q67_returned_items_customers",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      n_name,
      CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q67_returned_items_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a half-year.
    orderBy+limit plans TakeOrderedAndProject — no full sort at scale."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q68_large_quantity_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT
      c_name,
      c_custkey,
      o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q68_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold — the
    HAVING subquery becomes an aggregated key set semi-joined (broadcast:
    the qualifying set is a tiny fraction of orders) back onto the facts."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "order_date",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q69_market_share",
    oracle="""
    SELECT
      CAST(year(o_orderdate) AS BIGINT) AS order_year,
      CAST(SUM(CASE WHEN n_name = 'NATION_3'
               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
               ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS mkt_share,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q69_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly supplier revenue as a
    conditional-aggregation ratio (numerator and denominator in ONE pass —
    no self-join, no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders")
    china_rev = F.when(F.col("n_name") == "NATION_3", revenue()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (F.sum(china_rev).cast("double") / F.sum(revenue()).cast("double")).alias(
                "mkt_share"
            ),
            F.sum(revenue()).cast("double").alias("total_revenue"),
        )
        .orderBy("order_year")
    )


@register(
    "q105_priority_late_shipping",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q105_priority_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders in a quarter window with
    at least one lineitem shipped >90 days after the order date, counted by
    priority.  The EXISTS becomes a left-semi join whose condition
    references both sides; Catalyst pushes the date filter below the join
    and AQE picks the join strategy from the filtered size."""
    ord_ = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = ord_.join(
        li,
        (ord_["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > ord_["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q106_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
      COUNT(*) AS n_custs,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q106_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery + anti join — customers
    whose balance exceeds the positive-balance average but who placed no
    order since 2000, grouped by nation.  The scalar average is a 1-row
    broadcast cross join (no driver round-trip); the NOT EXISTS is a
    left-anti join against the date-filtered orders."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count("*").cast("double")).alias(
            "a"
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    dormant = rich.join(
        recent, rich["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(dec2("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q107_blocking_supplier",
    headline=True,
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    blocking AS (
      SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
      WHERE EXISTS (
          SELECT 1 FROM pairs p
          WHERE p.l_orderkey = l1.l_orderkey AND p.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM late l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
        )
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM blocking JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q107_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in
    multi-supplier orders.

    Single-pass formulation instead of the textbook double-correlated
    EXISTS/NOT-EXISTS self-joins: per (order, supplier) compute a late
    flag in one lineitem⋈orders pass, then cascade per-order hash
    aggregations — "another supplier exists" is n_supp > 1, "no other
    late supplier" is n_late = 1, and under n_late = 1 the blocking
    supplier is MAX(CASE WHEN late THEN suppkey).  r16 optimization
    (guide §2.4 one-exchange keying + §2.3 project-early): lineitem is
    projected to its three needed columns and hash-REPARTITIONED by
    l_orderkey before the join, so the broadcast join's output keeps
    that partitioning and BOTH per-order aggregations reuse it —
    measured at sf0.1 the plan went 3 Exchanges + Window/Sort →
    1 Exchange and 1.384 s → 0.839 s (-39%).  The second correlation
    is a hash aggregate instead of the previous count/sum window, which
    also removes the per-partition Sort.  At cluster scale the same
    repartition is the shuffle the orderkey join needs anyway (exchange
    reuse — zero extra cost), and bucketing lineitem and orders by
    orderkey removes even that."""
    li = load_table(spark, sf_dir, "lineitem")
    ord_ = load_table(spark, sf_dir, "orders")
    pair_late = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition("l_orderkey")
        .join(ord_, F.col("l_orderkey") == ord_["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    blocking = (
        pair_late.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("is_late").alias("n_late"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "l_suppkey"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        blocking.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q108_brand_revenue_share",
    oracle="""
    WITH brand_rev AS (
      SELECT p_brand,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    ),
    total AS (
      SELECT SUM(rev) AS t FROM brand_rev
    )
    SELECT p_brand, CAST(rev AS DOUBLE) AS revenue
    FROM brand_rev, total
    WHERE rev * 25 > t
    ORDER BY p_brand
    """,
)
def q108_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global aggregate — brands whose
    revenue exceeds 1/25 of total revenue.  The threshold comparison stays
    in exact DECIMAL on both sides (rev*25 > total — integer-scaled, no
    float boundary ambiguity); the global total is a 1-row broadcast.
    Per-brand partials are map-side combined, so the second pass over
    brand_rev is a few-hundred-row re-aggregation, not a rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(F.sum(revenue()).alias("rev"))
    )
    total = brand_rev.agg(F.sum("rev").alias("t"))
    return (
        brand_rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev") * 25 > F.col("t"))
        .select("p_brand", F.col("rev").cast("double").alias("revenue"))
        .orderBy("p_brand")
    )


@register(
    "q125_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
      COUNT(*) AS n_small_orders,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q125_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group correlated scalar subquery — lineitems
    whose quantity is below 20% of their part's average, grouped by brand.
    The correlated average becomes a per-part aggregate joined back to the
    fact (both sides shuffle on l_partkey, so the aggregate reuses the
    join partitioning); the threshold comparison is per-row, pushed after
    the join.  The exact-decimal average keeps the 0.2·avg boundary
    engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(dec2("l_quantity")).cast("double") / F.count("*").cast("double")
        ).alias("avg_qty")
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(part_avg, li["l_partkey"] == part_avg["pk"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_orders"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "q126_top_supplier",
    oracle="""
    WITH supplier_rev AS (
      SELECT l_suppkey AS sk,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(rev) AS m FROM supplier_rev)
    SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
    FROM supplier_rev JOIN supplier ON sk = s_suppkey, mx
    WHERE rev = mx.m
    ORDER BY s_suppkey
    """,
)
def q126_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax against an aggregated view — the
    quarter's top-revenue supplier(s), ties kept (revenue compared in
    exact DECIMAL, so equality is unambiguous).  The max is a 1-row
    broadcast against the per-supplier aggregate; the supplier dim is
    broadcast too — the fact table is touched exactly once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supplier_rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(revenue()).alias("rev")
    )
    mx = supplier_rev.agg(F.max("rev").alias("m"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        supplier_rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev") == F.col("m"))
        .join(F.broadcast(sup), F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q141_dominant_part_suppliers",
    oracle="""
    WITH sel AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem JOIN sel ON l_partkey = p_partkey
      GROUP BY l_partkey, l_suppkey
    ),
    qual AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, sq, SUM(sq) OVER (PARTITION BY l_partkey) AS tq
        FROM ps
      ) WHERE 8 * sq > tq
    )
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier JOIN qual ON s_suppkey = l_suppkey
    ORDER BY s_suppkey
    """,
)
def q141_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries with a correlated quantity
    comparison — suppliers shipping an outsized share (>1/8) of any red
    part's volume.  Decorrelated the warehouse way: the part filter
    broadcasts into the fact scan; the explicit repartition on l_partkey
    lets BOTH the (part, supplier) aggregate and the per-part window total
    run off that single shuffle (partkey clustering satisfies the
    compound-key aggregate's distribution, so the naive plan's second
    scan + second exchange of the fact disappear); the final membership
    test is a broadcast semi-join into the supplier dim.  The share test
    is ``8·sq > tq`` in exact DECIMAL — no float boundary, so both
    engines classify every edge case identically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sel = part.filter(F.col("p_name").startswith("red")).select("p_partkey")
    ps = (
        li.join(F.broadcast(sel), li["l_partkey"] == sel["p_partkey"])
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("sq"))
    )
    tq = F.sum("sq").over(Window.partitionBy("l_partkey"))
    qual = (
        ps.withColumn("tq", tq)
        .filter(F.lit(8) * F.col("sq") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(
            F.broadcast(qual), sup["s_suppkey"] == qual["l_suppkey"], "left_semi"
        )
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


@register(
    "q145_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sq,
             COUNT(*) AS nq
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0
        AS avg_yearly,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < 0.2 * (CAST(sq AS DOUBLE) / nq)
    """,
)
def q145_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand
    — the classic correlated AVG subquery (``l_quantity < 0.2 * avg qty of
    this part``).  Decorrelated the warehouse way: the per-part average is
    a partial-aggregable group-by over the fact (NOT a per-row rescan),
    re-joined on l_partkey; the brand dim filter broadcasts.  At cluster
    scale both the aggregate and the re-join shuffle on l_partkey, so AQE
    reuses one exchange.  Threshold arithmetic is a single identical IEEE
    expression on both engines (exact BIGINT sums → one division, one
    multiply), so boundary rows classify identically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq"),
        F.count(F.lit(1)).alias("nq"),
    )
    avg_qty = F.col("sq").cast("double") / F.col("nq")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("pa_partkey") == li["l_partkey"])
        .filter(F.col("l_quantity") < F.lit(0.2) * avg_qty)
        .agg(
            (F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q146_dormant_customers",
    oracle="""
    WITH pos AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT
      c_nationkey,
      COUNT(*) AS numcust,
      CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q146_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-dormant customers — a scalar AVG
    subquery plus a NOT EXISTS anti-join.  The scalar (average positive
    balance) is one global aggregate broadcast as a literal join (a 1-row
    cross join — Spark plans it as BroadcastNestedLoop over one row, which
    is the right plan); dormancy is a left_anti join against the
    date-pruned orders scan (the predicate pushes to the parquet scan, so
    at scale the anti-join side reads only recent partitions).  The exact
    DECIMAL sum → single division makes the scalar bitwise identical, so
    the ``>`` cut classifies every customer the same in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q147_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON o_custkey = c_custkey
       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q147_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, with a
    filtered LEFT OUTER join (customers with zero qualifying orders must
    appear in the 0 bucket — the join filter lives in the ON clause, not
    a WHERE, which would silently turn the join inner).  Two-level
    aggregation: the first groups on the join key already being shuffled
    (c_custkey), the second is a tiny histogram reduce.  COUNT(o_orderkey)
    counts only matched rows — null-aware, unlike COUNT(*)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q148_top_quarter_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q148_top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view + "supplier(s) achieving the
    maximum" equality — decorrelated as a scalar MAX aggregate
    broadcast-equijoined back to the view (an empty-frame window would
    funnel the whole ~|suppliers| aggregate through ONE window task;
    suppliers grow linearly with scale).  The comparison happens in
    exact DECIMAL before any double cast, so ties and the max itself
    are engine-independent.  The date filter pushes to the scan: one
    quarter of the fact is read, not the whole table."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue()).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
