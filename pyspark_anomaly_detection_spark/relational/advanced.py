"""Advanced relational operators: pivot, explode, grouping sets, exact
percentiles, stats-by-formula, fuzzy string matching, date arithmetic,
max_by, conditional/bitwise aggregates, SQL-surface subqueries, salted
(skew-resistant) aggregation.

Parity notes:

* Exact *discrete* percentiles are computed by manual rank selection
  (``row_number`` + ``ceil(p·n)``) with the SAME formula in the oracle —
  continuous interpolation (``percentile``/``quantile_cont``) differs in
  the last ulp between engines and is exposed only as a library helper.
* Variance/correlation use the exact decimal-sum formulas
  (``(n·Σx² − (Σx)²) / (n·(n−1))`` over DECIMAL) rather than native
  ``stddev``/``corr`` (Welford accumulation is order-dependent).
* The salted aggregation re-aggregates partials — identical results to a
  plain group-by (its oracle), demonstrating the skew-mitigation pattern
  for hot keys at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2, fmt_date, sum_dbl
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation).
# --------------------------------------------------------------------------


@register(
    "q40_pivot_status",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p,
      CAST(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS volume_f
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q40_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit value list (explicit values keep the
    plan static — no extra distinct-scan job, which matters at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
            F.sum(dec2("o_totalprice")).alias("vol"),
        )
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("status_f"),
        F.coalesce("O_n", F.lit(0)).alias("status_o"),
        F.coalesce("P_n", F.lit(0)).alias("status_p"),
        F.coalesce(F.col("F_vol").cast("double"), F.lit(0.0)).alias("volume_f"),
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Explode / lateral view: token frequency table.
# --------------------------------------------------------------------------


@register(
    "q41_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def q41_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# GROUPING SETS via the SQL surface (registered temp views — both entry
# surfaces hit the same Catalyst lifecycle, SURVEY §3.4).
# --------------------------------------------------------------------------


@register(
    "q42_grouping_sets",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      COUNT(*) AS n_items,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY returnflag, linestatus
    """,
)
def q42_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT
          COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY returnflag, linestatus
        """
    )


# --------------------------------------------------------------------------
# Exact discrete percentiles by rank selection — same arithmetic on both
# sides (ceil(p·n) over row_number), no interpolation.
# --------------------------------------------------------------------------

PERCENTILES = (0.5, 0.9, 0.99)


@register(
    "q43_percentiles_exact",
    oracle="""
    WITH ranked AS (
      SELECT
        l_returnflag,
        l_extendedprice,
        ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    )
    SELECT
      l_returnflag,
      MAX(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN l_extendedprice END) AS p50,
      MAX(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN l_extendedprice END) AS p90,
      MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT) THEN l_extendedprice END) AS p99,
      MAX(cnt) AS n_rows
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q43_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranks come from the scalable ``grouped_row_ids`` (range exchange
    on (flag, price…)) — l_returnflag has only THREE values, so a
    per-flag window would sort a third of lineitem in one task at
    100 TB.  The tiebreak columns don't change the picked values (the
    k-th price in sorted order is tie-invariant), so the oracle's
    plain ROW_NUMBER ranking still hash-matches."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    li = load_table(spark, sf_dir, "lineitem")
    ranked = grouped_row_ids(
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        "l_returnflag",
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        ordinal_col="rn",
        total_col="cnt",
    )

    def pick(p: float) -> Column:
        target = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(
            F.when(F.col("rn") == target, F.col("l_extendedprice"))
        )

    return (
        ranked.groupBy("l_returnflag")
        .agg(
            pick(0.5).alias("p50"),
            pick(0.9).alias("p90"),
            pick(0.99).alias("p99"),
            F.max("cnt").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def percentile_cont(df: DataFrame, col: str, p: float) -> DataFrame:
    """Library helper: native continuous percentile (NOT oracle-checked —
    interpolation arithmetic differs across engines in the last ulp)."""
    return df.agg(F.percentile(col, p).alias(f"p{int(p * 100)}"))


# --------------------------------------------------------------------------
# Exact variance / correlation via decimal-sum formulas.
# --------------------------------------------------------------------------


@register(
    "q44_stats_by_formula",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(*) AS n,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_x,
      (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
       - CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) * CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE))
      / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS var_qty,
      (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
       - CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) * CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE))
      / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q44_stats_by_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance and covariance from exact decimal sums — identical
    doubles in both engines (native stddev/covar use order-dependent
    accumulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count("*").cast("double")
    sx = F.sum(dec2("l_quantity")).cast("double")
    sxx = F.sum(dec2("l_quantity") * dec2("l_quantity")).cast("double")
    sd = F.sum(dec2("l_discount")).cast("double")
    sxd = F.sum(dec2("l_quantity") * dec2("l_discount")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            sx.alias("sum_x"),
            ((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))).alias("var_qty"),
            ((n * sxd - sx * sd) / (n * (n - F.lit(1.0)))).alias("cov_qty_disc"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Fuzzy string matching: Levenshtein pairs (classic edit distance in both).
# --------------------------------------------------------------------------


@register(
    "q45_levenshtein_pairs",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    ORDER BY dist, name_a, name_b
    """,
)
def q45_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 6)
        .orderBy("dist", "name_a", "name_b")
    )


# --------------------------------------------------------------------------
# Date arithmetic family: trunc / last_day / datediff / interval add.
# --------------------------------------------------------------------------


@register(
    "q46_date_arithmetic",
    oracle="""
    SELECT
      strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
      COUNT(*) AS n_items,
      MAX(date_diff('day', date_trunc('month', l_shipdate), l_shipdate)) AS max_day_offset,
      strftime(last_day(CAST(MIN(l_shipdate) AS DATE)), '%Y-%m-%d') AS month_end,
      strftime(date_trunc('month', MIN(l_shipdate)) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_quarter
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def q46_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    month = F.date_trunc("month", "l_shipdate")
    return (
        li.groupBy(fmt_date(month).alias("ship_month"))
        .agg(
            F.count("*").alias("n_items"),
            F.max(F.datediff(F.col("l_shipdate"), month.cast("date"))).alias(
                "max_day_offset"
            ),
            fmt_date(F.last_day(F.min("l_shipdate"))).alias("month_end"),
            fmt_date(
                F.date_trunc("month", F.min("l_shipdate")) + F.expr("INTERVAL 3 MONTHS")
            ).alias("plus_quarter"),
        )
        .orderBy("ship_month")
    )


# --------------------------------------------------------------------------
# max_by / arg_max with a unique ordering key (deterministic on ties).
# --------------------------------------------------------------------------


@register(
    "q47_maxby_per_segment",
    oracle="""
    SELECT
      c_mktsegment,
      arg_max(o_orderkey,
              CAST(o_totalprice AS DECIMAL(18,2)) * 10000000 + o_orderkey) AS top_orderkey,
      CAST(MAX(o_totalprice) AS DOUBLE) AS top_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q47_maxby_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by keyed by (price, orderkey) packed into one exact decimal —
    unique ordering key makes the pick deterministic across engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    order_key = dec2("o_totalprice") * F.lit(10_000_000) + F.col("o_orderkey")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("o_orderkey", order_key).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Conditional / boolean / bitwise aggregates.
# --------------------------------------------------------------------------


@register(
    "q48_conditional_bitwise_aggs",
    oracle="""
    SELECT
      event_type,
      CAST(count_if(value > 250) AS BIGINT) AS n_high,
      bool_and(value >= 0) AS all_nonneg,
      bool_or(CAST(json_extract_string(props, '$.k') AS INT) = 0) AS any_k_zero,
      bit_and(CAST(json_extract_string(props, '$.k') AS INT)) AS k_and,
      bit_or(CAST(json_extract_string(props, '$.k') AS INT)) AS k_or,
      bit_xor(CAST(json_extract_string(props, '$.k') AS INT)) AS k_xor,
      CAST(CAST(SUM(DISTINCT CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS distinct_value_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q48_conditional_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 250).alias("n_high"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(k == 0).alias("any_k_zero"),
            F.bit_and(k).alias("k_and"),
            F.bit_or(k).alias("k_or"),
            F.bit_xor(k).alias("k_xor"),
            F.sum_distinct(dec2("value")).cast("double").alias("distinct_value_sum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# SQL surface: correlated scalar subquery (same Catalyst lifecycle).
# --------------------------------------------------------------------------


@register(
    "q49_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)
      FROM customer i WHERE i.c_nationkey = c.c_nationkey
    )
    ORDER BY c_custkey
    """,
)
def q49_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance (decorrelated by
    Catalyst into an aggregate + join — no per-row subquery execution).
    The inner avg uses the exact decimal-sum convention so the comparison
    threshold is bitwise-identical in both engines."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_cs_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM _cs_customer c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM _cs_customer i WHERE i.c_nationkey = c.c_nationkey
        )
        ORDER BY c_custkey
        """
    )


# --------------------------------------------------------------------------
# Salted aggregation: the skew-mitigation pattern with plain-group-by
# semantics (its oracle IS the plain group-by).
# --------------------------------------------------------------------------

N_SALTS = 8


def salted_aggregate(
    df: DataFrame, key: str, value_col: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-stage aggregation: (key, salt) partial → key final.

    For hot keys at 100 TB, one reducer per key melts; salting spreads each
    key over ``n_salts`` reducers, and the final (tiny) re-aggregation
    combines the partials.  Works for any algebraic aggregate."""
    salt = (F.crc32(F.col(value_col).cast("string")) % n_salts).alias("_salt")
    partial = (
        df.select(key, value_col, salt)
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_cnt"),
            F.sum(dec2(value_col)).alias("_sum"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("n_events"),
        F.sum("_sum").cast("double").alias("total_value"),
    )


@register(
    "q50_salted_aggregation",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q50_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(ev, "event_type", "value").orderBy("event_type")


@register(
    "q151_winsorized_stats",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice AS v,
        ROW_NUMBER() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice, l_orderkey, l_linenumber)
          AS rn,
        COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    ),
    cut AS (
      SELECT l_returnflag, v, cnt,
        MAX(CASE WHEN rn = CAST(ceil(0.01 * cnt) AS BIGINT) THEN v END)
          OVER (PARTITION BY l_returnflag) AS lo,
        MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT) THEN v END)
          OVER (PARTITION BY l_returnflag) AS hi
      FROM ranked
    )
    SELECT l_returnflag,
      CAST(MAX(cnt) AS BIGINT) AS n,
      MAX(lo) AS p01,
      MAX(hi) AS p99,
      CAST(COUNT(CASE WHEN v < lo THEN 1 END) AS BIGINT) AS n_clipped_lo,
      CAST(COUNT(CASE WHEN v > hi THEN 1 END) AS BIGINT) AS n_clipped_hi,
      CAST(SUM(CAST(LEAST(GREATEST(v, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*) AS winsorized_mean
    FROM cut
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q151_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped-tail) robust statistics per segment — the
    standard feature-robustization step before model training: clip each
    value into the exact [p01, p99] rank-selected band, then average.

    The percentiles are rank-SELECTED (actual data points, deterministic
    tiebreak on the row key), never interpolated, so the clip boundaries
    are parquet-exact doubles and the clipped values stay 2-dp — which
    keeps the winsorized mean inside the DECIMAL-exact summation
    convention (one IEEE division at the end).  Plan: ranks come from
    the scalable ``grouped_row_ids`` (range exchange — l_returnflag has
    only three values, so a per-flag window task would sort a third of
    lineitem at 100 TB); the [p01, p99] cut points reduce to a 3-row
    dimension broadcast-joined back instead of a broadcast-back window
    over the same giant partitions."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    li = load_table(spark, sf_dir, "lineitem")
    ranked = grouped_row_ids(
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            "l_orderkey",
            "l_linenumber",
        ),
        "l_returnflag",
        ["v", "l_orderkey", "l_linenumber"],
        ordinal_col="rn",
        total_col="cnt",
    )

    def pick(p: float) -> Column:
        target = F.ceil(F.lit(p) * F.col("cnt")).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("v")))

    cuts = ranked.groupBy("l_returnflag").agg(
        F.max("cnt").alias("n"),
        pick(0.01).alias("lo"),
        pick(0.99).alias("hi"),
    )
    # null-SAFE join: a plain equi-join on the group key silently drops
    # the NULL l_returnflag group (nulls fuzz variant)
    cut = ranked.join(
        F.broadcast(cuts.withColumnRenamed("l_returnflag", "_g")),
        F.col("l_returnflag").eqNullSafe(F.col("_g")),
    ).drop("_g")
    clipped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        cut.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max("lo").alias("p01"),
            F.max("hi").alias("p99"),
            F.count(F.when(F.col("v") < F.col("lo"), 1)).alias("n_clipped_lo"),
            F.count(F.when(F.col("v") > F.col("hi"), 1)).alias("n_clipped_hi"),
            (
                F.sum(clipped.cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("winsorized_mean"),
        )
        .orderBy("l_returnflag")
    )
