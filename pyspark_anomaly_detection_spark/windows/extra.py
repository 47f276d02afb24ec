"""Window-function and SQL-surface breadth: interval range frames,
lateral joins, value-picking window functions, relative-rank functions.

Complements ``windows/features.py`` (the reference's numeric range frames
over unix seconds) with the remaining analytic-window surface a warehouse
engine must expose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2, fmt_ts
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


@register(
    "q78_interval_range_frame",
    oracle="""
    SELECT
      user_id,
      event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      COUNT(*) OVER w AS n_prev_1h,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS sum_prev_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
    )
    ORDER BY user_id, ts, event_id
    """,
)
def q78_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h frame expressed DIRECTLY as an interval range (no unix
    conversion) on the SQL surface — the frame spec form Spark shares with
    standard SQL.  Equal-ts rows share one frame (RANGE semantics), so the
    aggregate is deterministic without an id tie-break."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_irf_events")
    return spark.sql(
        """
        SELECT
          user_id,
          event_id,
          date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts,
          COUNT(*) OVER w AS n_prev_1h,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_prev_1h
        FROM _irf_events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
        ORDER BY user_id, ts, event_id
        """
    )


@register(
    "q79_lateral_join",
    oracle="""
    SELECT n_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM nation, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_nationkey = n_nationkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    )
    ORDER BY n_name, o_totalprice DESC, o_orderkey
    """,
)
def q79_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per nation.  Catalyst
    decorrelates to a ranked window under the hood — same plan family as
    q16, different (standard-SQL) surface."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM _lat_nation, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders JOIN _lat_customer ON o_custkey = c_custkey
          WHERE c_nationkey = n_nationkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        )
        ORDER BY n_name, o_totalprice DESC, o_orderkey
        """
    )


@register(
    "q80_value_picking_windows",
    oracle="""
    SELECT
      user_id,
      event_id,
      FIRST_VALUE(event_type) OVER w AS first_type,
      LAST_VALUE(event_type) OVER w_full AS last_type,
      NTH_VALUE(event_type, 2) OVER w_full AS second_type
    FROM events
    WINDOW
      w AS (PARTITION BY user_id ORDER BY ts, event_id),
      w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, event_id
    """,
)
def q80_value_picking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value — last/nth over the FULL frame (the default
    frame ends at CURRENT ROW, the classic last_value foot-gun)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
    ).orderBy("user_id", "event_id")


@register(
    "q81_relative_rank",
    oracle="""
    SELECT
      o_orderkey,
      o_orderpriority,
      PERCENT_RANK() OVER w AS pct_rank,
      CUME_DIST() OVER w AS cume,
      RANK() OVER w AS rnk,
      DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, rnk
    LIMIT 200
    """,
)
def q81_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / rank / dense_rank — the exact rational
    definitions ((rank−1)/(n−1), rank_rows/n) match across engines since
    the ordering key (price, orderkey) is unique, which also makes all
    four functions pure (rank, n) arithmetic — so they run on the
    scalable ``grouped_row_ids`` (range exchange on (priority, price…);
    o_orderpriority has only five values, so a per-priority window task
    would sort a fifth of orders at 100 TB)."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    orders = load_table(spark, sf_dir, "orders")
    ranked = grouped_row_ids(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority",
        ["o_totalprice", "o_orderkey"],
    )
    r, n = F.col("grp_rank"), F.col("grp_n")
    n1 = n - F.lit(1)
    pct = F.when(n1 == 0, F.lit(0.0)).otherwise(
        (r - F.lit(1)).cast("double") / n1
    )
    return (
        ranked.select(
            "o_orderkey",
            "o_orderpriority",
            pct.alias("pct_rank"),
            (r.cast("double") / n).alias("cume"),
            r.cast("int").alias("rnk"),
            r.cast("int").alias("drnk"),
        )
        .orderBy("o_orderpriority", "rnk")
        .limit(200)
    )
