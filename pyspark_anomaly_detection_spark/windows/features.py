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
    truncate_to_seconds: bool = False,
) -> DataFrame:
    """Library form of the reference's feature builder
    (``src/features/build_features.py:8-52``): velocity_1h, avg_diff_24h,
    merchant_diversity on any (partition, ts, amount, counterparty) table.

    Frame-edge semantics: the default frames bound in epoch **microseconds**
    (oracle-parity choice — DuckDB range frames agree exactly).  The
    reference truncates to whole seconds via ``unix_timestamp``
    (src/features/build_features.py:26-33), so rows landing exactly at a
    1h/24h/6h boundary *within* a second classify differently between the
    two modes.  Pass ``truncate_to_seconds=True`` for bit-parity with the
    reference pipeline's outputs.
    """
    if truncate_to_seconds:
        ts_us = F.unix_timestamp(F.col(ts_col))
        hour = 3_600
    else:
        ts_us = F.unix_micros(F.col(ts_col))
        hour = US_PER_HOUR
    base = df.withColumn("_ts_us", ts_us)
    w1h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-1 * hour, 0)
    )
    w24h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-24 * hour, 0)
    )
    w6h = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-6 * hour, 0)
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` per key — the operator Spark lacks natively.

    Spark-first implementation: union-tag the two streams, ONE window pass
    (partition by key, order by ts) carrying the right side's last-seen
    values forward, then keep left rows.  Single shuffle on the key —
    versus the naive range-join + groupBy which is quadratic per key.
    Right-side columns come back as ``asof_<col>`` plus ``asof_ts``.
    """
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.unix_micros(F.col(left_ts)), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_marked = F.when(F.col("_side") == 0, F.unix_micros(F.col(left_ts)))
    carried = unioned.withColumn(
        "asof_ts_us", F.max(right_marked).over(w)
    )
    for c in right_cols:
        carried = carried.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return (
        carried.filter(F.col("_side") == 1)
        .withColumn("asof_ts", F.timestamp_micros("asof_ts_us"))
        .drop("_side", "asof_ts_us", *right_cols)
    )


@register(
    "q51_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, 1 AS side, NULL AS pvalue FROM events
        WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, NULL AS event_id, 0 AS side, value AS pvalue FROM events
        WHERE event_type = 'purchase'
    ),
    carried AS (
      SELECT
        user_id, ts, event_id, side,
        MAX(CASE WHEN side = 0 THEN epoch_us(ts) END) OVER w AS asof_ts_us,
        CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) OVER w AS BIGINT) AS n_purchases_before
      FROM tagged
      WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts), side
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    )
    SELECT
      event_id,
      user_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
      epoch_us(ts) - asof_ts_us AS us_since_purchase,
      n_purchases_before
    FROM carried
    WHERE side = 1
    ORDER BY event_id
    """,
)
def q51_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event: how long since that user's latest preceding
    'purchase' (null when none) — the as-of join on the events table."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(errors, purchases, on="user_id", right_cols=("value",))
    # count of purchases at-or-before, for oracle cross-checking
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("error_ts"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("us_since_purchase"),
    ).join(
        _purchase_counts(ev), on=["event_id"], how="left"
    ).select(
        "event_id", "user_id", "error_ts", "us_since_purchase",
        F.coalesce("n_purchases_before", F.lit(0)).alias("n_purchases_before"),
    ).orderBy("event_id")


def _purchase_counts(ev: DataFrame) -> DataFrame:
    """Per error event: purchases at-or-before it for the same user (window
    over the union-tagged stream, mirroring the oracle CTE)."""
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 0)
        .alias("_side"),
    ).filter(F.col("_side").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "n_purchases_before",
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).over(w),
        )
        .filter(F.col("_side") == 1)
        .select("event_id", "n_purchases_before")
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
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w24 AS VARCHAR) AS DOUBLE)
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
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS VARCHAR) AS DOUBLE) AS running_value
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
