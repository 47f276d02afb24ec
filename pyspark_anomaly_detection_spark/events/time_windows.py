"""Event-time windowed aggregations (SURVEY.md §2.12).

The reference is batch-only; its windows are analytic range frames.  This
module adds the event-time surface on ``events``: tumbling / sliding /
session group-by windows — the batch forms of the Structured Streaming
operators (the DataFrame code is identical under ``readStream``; see
``streaming.jobs`` for the streaming wrappers with watermarks).

Oracle mapping:

* tumbling  → DuckDB ``time_bucket(interval, ts)``
* sliding   → each event belongs to exactly window/slide buckets → expand
  with a small ``range()`` cross join (no DuckDB sliding-window builtin)
* session   → classic gaps-and-islands (lag + cumulative new-session flags)

Scale: these are plain hash aggregations on derived bucket keys — fully
parallel, map-side-combinable.  Session windows shuffle once on the
partition key (user) then sort within; Spark's ``session_window`` does the
merge natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import fmt_ts, sum_dbl
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


def tumbling(df: DataFrame, ts_col: str, width: str, *keys: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch or streaming)."""
    return df.groupBy(F.window(ts_col, width).alias("win"), *keys)


@register(
    "q24_tumbling_hourly",
    oracle="""
    SELECT
      strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    headline=True,
)
def q24_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            sum_dbl("value").alias("total_value"),
        )
        .select(
            fmt_ts(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q25_sliding_1h_15m",
    oracle="""
    -- each event falls in exactly 4 windows (1h width / 15m slide)
    SELECT
      strftime(
        time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes',
        '%Y-%m-%d %H:%M:%S.%f'
      ) AS window_start,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    CROSS JOIN (SELECT unnest(range(4)) AS k)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q25_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            sum_dbl("value").alias("total_value"),
        )
        .select(
            fmt_ts(F.col("win.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "q26_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, ts, value,
        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
             ) > 1800000000 OR LAG(ts) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
             ) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT
        user_id, ts, value,
        SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
      FROM flagged
    )
    SELECT
      user_id,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q26_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows (Spark ``session_window`` builtin).

    Session end = last event + gap (Spark's definition); the oracle
    reproduces it with gaps-and-islands.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            sum_dbl("value").alias("session_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("win.start")).alias("session_start"),
            fmt_ts(F.col("win.end")).alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q27_hourly_event_trends",
    oracle="""
    SELECT
      hour(ts) AS txn_hour,
      COUNT(*) AS txn_count,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    GROUP BY txn_hour
    ORDER BY txn_hour
    """,
)
def q27_hourly_event_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's gold hourly trends (src/data/gold.py:43-53) on events:
    hour-of-day profile with an anomaly-count column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("txn_hour"))
        .agg(
            F.count("*").alias("txn_count"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "error_count"
            ),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
        )
        .orderBy("txn_hour")
    )


@register(
    "q152_windowed_dedup",
    oracle="""
    WITH grp AS (
      SELECT user_id, event_type,
             time_bucket(INTERVAL '10 minutes', ts) AS bucket,
             COUNT(*) AS g
      FROM events
      GROUP BY user_id, event_type, bucket
    )
    SELECT event_type,
      CAST(SUM(g) AS BIGINT) AS n_raw,
      COUNT(*) AS n_survivors,
      CAST(COUNT(*) AS DOUBLE) / SUM(g) AS keep_ratio
    FROM grp
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q152_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed deduplication: collapse repeat (user, event_type) firings
    inside each 10-minute tumbling bucket to one survivor — the batch twin
    of Structured Streaming's ``dropDuplicatesWithinWatermark`` (same
    keys + event-time bound, tested side-by-side in the streaming suite).

    Expressed as pure two-level aggregation, NOT a row_number window:
    the dedup groupBy is map-side combinable (partial aggregation before
    the shuffle), so at 100 TB the exchange carries one row per
    (user, type, bucket) rather than every raw event — the property that
    makes streaming state-store dedup bounded, reproduced batch-side."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy(
        "user_id", "event_type", F.window("ts", "10 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("g"))
    return (
        grp.groupBy("event_type")
        .agg(
            F.sum("g").alias("n_raw"),
            F.count(F.lit(1)).alias("n_survivors"),
            (F.count(F.lit(1)).cast("double") / F.sum("g")).alias("keep_ratio"),
        )
        .orderBy("event_type")
    )
