"""Time-range analytic windows — the reference's signature capability.

Re-expresses ``src/features/build_features.py:26-39`` (trailing 1h velocity,
24h rolling-average deviation, 6h distinct-receiver diversity) on the
``events`` table: partition ``user_id``, order ``ts``, range frames in
epoch **microseconds** (``unix_micros``) so Spark and the DuckDB oracle
agree exactly (second-truncation would disagree at frame edges).

Scale notes:

* All three frames share one ``partitionBy(user_id).orderBy(ts_us)`` spec →
  Catalyst plans a single shuffle + sort reused by every window function.
* The distinct-count window keeps the reference's exact
  ``size(collect_set(...))`` semantics for parity; at 100 TB the scalable
  variant is ``approx_count_distinct`` over the same frame (documented in
  SURVEY §4.3) — exposed as ``merchant_diversity_approx`` in the library API
  but not oracle-checked (HLL sketches differ across engines).
* Skewed users (celebrity keys) are the risk at scale: AQE skew handling
  does not apply to window shuffles, so the cluster deployment would salt
  the partition key for the count/avg frames (algebraic aggregations) and
  keep exact distinct only where key depth is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import dec2, fmt_ts
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

US_PER_HOUR = 3_600_000_000


def with_behavioral_features(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    counterparty_col: str = "event_type",
) -> DataFrame:
    """Library form of the reference's feature builder
    (``src/features/build_features.py:8-52``): velocity_1h, avg_diff_24h,
    merchant_diversity on any (partition, ts, amount, counterparty) table.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    base = df.withColumn("_ts_us", ts_us)
    w1h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-1 * US_PER_HOUR, 0)
    )
    w24h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-24 * US_PER_HOUR, 0)
    )
    w6h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-6 * US_PER_HOUR, 0)
    )
    amount_dec_sum = F.sum(dec2(amount_col)).over(w24h).cast("double")
    amount_cnt = F.count(amount_col).over(w24h)
    return (
        base.withColumn("velocity_1h", F.count("*").over(w1h))
        .withColumn(
            "avg_diff_24h", F.col(amount_col) - amount_dec_sum / amount_cnt
        )
        .withColumn(
            "merchant_diversity",
            F.size(F.collect_set(counterparty_col).over(w6h)),
        )
        .drop("_ts_us")
    )


def merchant_diversity_approx(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    counterparty_col: str = "event_type",
    rsd: float = 0.05,
) -> DataFrame:
    """100-TB-scale variant of the diversity window: HLL sketch instead of a
    materialized per-row set (SURVEY §4.3's noted inefficiency)."""
    w6h = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-6 * US_PER_HOUR, 0)
    )
    return df.withColumn(
        "merchant_diversity_approx",
        F.approx_count_distinct(counterparty_col, rsd).over(w6h),
    )


@register(
    "q21_velocity_windows",
    oracle="""
    SELECT
      event_id,
      user_id,
      COUNT(*) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
      ) AS velocity_1h,
      value - (
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w24 AS DOUBLE)
        / COUNT(value) OVER w24
      ) AS avg_diff_24h,
      CAST(COUNT(DISTINCT event_type) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW
      ) AS INT) AS merchant_diversity
    FROM events
    WINDOW w24 AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
    headline=True,
)
def q21_velocity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    feats = with_behavioral_features(ev)
    return feats.select(
        "event_id", "user_id", "velocity_1h", "avg_diff_24h", "merchant_diversity"
    ).orderBy("event_id")


@register(
    "q22_time_since_last",
    oracle="""
    SELECT
      event_id,
      user_id,
      epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      ) AS us_since_last
    FROM events
    ORDER BY event_id
    """,
)
def q22_time_since_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lag-shaped ``time_since_last_transaction`` feature the reference
    receives pre-computed (``src/data/schemas.py:20``), computed natively."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (ts_us - F.lag(ts_us).over(w)).alias("us_since_last"),
    ).orderBy("event_id")


@register(
    "q23_rank_lead_lag",
    oracle="""
    SELECT
      user_id,
      event_id,
      RANK() OVER w AS rk,
      DENSE_RANK() OVER w AS drk,
      LEAD(event_type) OVER w AS next_type,
      LAG(event_type)  OVER w AS prev_type,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_value
    FROM events
    WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ORDER BY user_id, event_id
    """,
)
def q23_rank_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic functions + running total (rows frame)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.sum(dec2("value")).over(wrows).cast("double").alias("running_value"),
    ).orderBy("user_id", "event_id")
