"""Temporal table patterns: latest-snapshot dedup, SCD2 validity ranges,
and interval-overlap (concurrency) via a distributed sweep line.

These are the change-data shapes every warehouse pipeline needs on top of
raw event streams:

* q72 — latest record per key (``row_number`` desc): the "current
  snapshot" materialization of an append-only log.
* q73 — SCD2: collapse consecutive equal states and emit
  ``valid_from / valid_to`` ranges per (user, state run).
* q74 — peak concurrency: sweep line (+1 at session start, −1 at end)
  with the running sum computed SCALABLY: per-day partial sums prefixed
  by a (tiny, windowed) cumulative-offset table, instead of a global
  single-reducer ORDER BY window.  The naive global window is the classic
  100 TB trap — one partition does all the work; the two-pass prefix sum
  keeps the big side partitioned by day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.events.analytics import sessionize
from pyspark_anomaly_detection_spark.functions import fmt_ts
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


def latest_snapshot(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Current-state materialization: the last record per key under the
    given (total) ordering.  One shuffle on the key; at scale this is the
    compaction job that turns an append log into a queryable snapshot."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


@register(
    "q72_latest_snapshot",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rk
      FROM events
    )
    WHERE rk = 1
    ORDER BY user_id
    """,
)
def q72_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_snapshot(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        fmt_ts("ts").alias("last_ts"),
    ).orderBy("user_id")


@register(
    "q73_scd2_ranges",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
        CASE WHEN event_type IS DISTINCT FROM
                  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             THEN 1 ELSE 0 END AS chg
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts,
        CAST(SUM(chg) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS run_id
      FROM flagged
    ),
    ranges AS (
      SELECT user_id, event_type, run_id,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, run_id,
      strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      strftime(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id),
               '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      n_events
    FROM ranges
    ORDER BY user_id, run_id
    """,
)
def q73_scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event log: consecutive
    equal states collapse into one row with [valid_from, valid_to) —
    valid_to = the next run's start, NULL while current.  Same
    change-flag → running-sum machinery as sessionization, so still one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("run_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    ranges = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("_valid_from"), F.count("*").alias("n_events")
    )
    return ranges.select(
        "user_id",
        "event_type",
        "run_id",
        fmt_ts("_valid_from").alias("valid_from"),
        fmt_ts(F.lead("_valid_from").over(wrun)).alias("valid_to"),
        "n_events",
    ).orderBy("user_id", "run_id")


def distributed_running_sum(
    points: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
) -> DataFrame:
    """Global running sum without a global single-partition window.

    Two passes: (1) running sum within each ``part_col`` partition;
    (2) per-partition totals — a table with one row per partition —
    prefix-summed with a window over that TINY table and broadcast back
    as each partition's starting offset.  The big side never leaves its
    partitioning."""
    w_in = Window.partitionBy(part_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = points.withColumn("_local", F.sum(value_col).over(w_in))
    totals = points.groupBy(part_col).agg(F.sum(value_col).alias("_total"))
    w_tot = (
        Window.orderBy(part_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        part_col,
        F.coalesce(F.sum("_total").over(w_tot), F.lit(0)).alias("_offset"),
    )
    return local.join(F.broadcast(offsets), part_col).withColumn(
        out_col, (F.col("_local") + F.col("_offset")).cast("bigint")
    ).drop("_local", "_offset")


@register(
    "q98_time_weighted_avg",
    oracle="""
    WITH spans AS (
      SELECT user_id, value, epoch_us(ts) AS t_us,
        LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS next_us
      FROM events
    )
    SELECT
      user_id,
      (CAST(SUM(CAST(round(value * 100) AS HUGEINT) * (next_us - t_us)) AS DOUBLE)
        / CAST(SUM(next_us - t_us) AS DOUBLE)) / 100.0 AS time_weighted_avg,
      CAST(COUNT(next_us) AS BIGINT) AS n_spans
    FROM spans
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q98_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over irregularly-sampled events (each value
    held until the user's next event): Σ value·Δt / Σ Δt.  The weighted
    sum runs in exact INTEGER cents × microseconds (int→double casts are
    correctly rounded in both engines, unlike wide-decimal→double which
    double-rounds in the last ulp), so the result is a fixed sequence of
    identical IEEE operations.  One window pass for Δt, one aggregate;
    shuffle key user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("t_us")
    # int128 product space (decimal(38,0) here, HUGEINT in the oracle):
    # cents × microseconds overflows INT64 once |value|·Δt passes
    # ~9e16·1e2 — the extremes fuzz variant hit it at ±1e15 values, and
    # real money at 1e5 with day-scale gaps sits within 10× of the
    # boundary.  int→double casts stay correctly rounded in both
    # engines (unlike scaled-decimal→double).
    cents = F.round(F.col("value") * 100).cast("decimal(38,0)")
    return (
        spans.groupBy("user_id")
        .agg(
            (
                (F.sum(cents * dt).cast("double") / F.sum(dt).cast("double"))
                / F.lit(100.0)
            ).alias("time_weighted_avg"),
            F.count("next_us").alias("n_spans"),
        )
        .orderBy("user_id")
    )


@register(
    "q74_peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_seq, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered
      GROUP BY user_id, session_seq
    ),
    points AS (
      SELECT s_start AS pt, 1 AS delta, user_id, session_seq FROM sessions
      UNION ALL
      SELECT s_end, -1, user_id, session_seq FROM sessions
    ),
    swept AS (
      SELECT date_trunc('day', pt) AS day,
        CAST(SUM(delta) OVER (
          ORDER BY pt, delta DESC, user_id, session_seq
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
      FROM points
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, MAX(conc) AS peak_concurrency
    FROM swept GROUP BY day ORDER BY day
    """,
)
def q74_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day.  Sessions → (+1 start, −1 end)
    point stream → distributed running sum (per-day windows + tiny
    broadcast prefix-offset table) → max per day.  The oracle uses the
    single-sequence formulation; equality proves the distributed prefix
    sum is exact.  Tie order at equal timestamps: starts before ends
    (inclusive overlap), then (user, session) for determinism."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    # (+1, −1) points via explode of ONE sessions reference — a union of
    # two selects replays the whole sessionization pipeline per leg
    # (PLAN_AUDIT round 3: events×4, 9 shuffles; now events×1).
    points = sessions.select(
        "user_id",
        "session_seq",
        F.explode(
            F.array(
                F.struct(F.col("s_start").alias("pt"), F.lit(1).alias("delta")),
                F.struct(F.col("s_end").alias("pt"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select(F.col("p.pt").alias("pt"), F.col("p.delta").alias("delta"), "user_id", "session_seq")
    points = points.withColumn("day", F.date_trunc("day", "pt"))
    # distributed_running_sum reads points twice (per-day sweep + the
    # prefix-offset table); points is 2 rows/session — persist it rather
    # than re-running sessionization (events×2 → ×1).
    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    points = tracked_persist(points)
    swept = distributed_running_sum(
        points,
        "day",
        [F.col("pt"), F.desc("delta"), F.col("user_id"), F.col("session_seq")],
        "delta",
        out_col="conc",
    )
    return (
        swept.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.max("conc").alias("peak_concurrency"))
        .orderBy("day")
    )


INTERVAL_JOIN_TOLERANCE_US = 300_000_000  # ±5 minutes


@register(
    "q127_bucketized_interval_join",
    oracle=f"""
    WITH err AS (
      SELECT event_id, ts, epoch_us(ts) AS t FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT e.event_id AS error_id, e.ts AS error_ts
      FROM err e JOIN pur p ON abs(e.t - p.t) <= {INTERVAL_JOIN_TOLERANCE_US}
    )
    SELECT strftime(date_trunc('hour', error_ts), '%Y-%m-%d %H:%M:%S.%f') AS hour,
      COUNT(*) AS n_pairs,
      COUNT(DISTINCT error_id) AS n_errors
    FROM pairs
    GROUP BY date_trunc('hour', error_ts)
    ORDER BY hour
    """,
)
def q127_bucketized_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (NO equi key): error events paired with any
    purchase within ±5 minutes, across all users.  Naively this is a
    BroadcastNestedLoopJoin — O(|errors|·|purchases|) comparisons, the
    classic 100 TB cliff.  The scale formulation buckets time at the
    tolerance width and equi-joins on bucket: a qualifying pair's buckets
    differ by at most 1, so exploding {{b−1, b, b+1}} on one side catches
    every pair, the join hash-partitions on bucket, and the exact |Δt|
    predicate filters the ~3× candidates.  Cost drops to
    O(pairs-per-bucket), plan-asserted hash/sort-merge (never NestedLoop)
    in tests/test_plans.py.  (DuckDB's optimizer runs the plain inequality
    join natively — the oracle states the semantics, not the strategy.)"""
    ev = load_table(spark, sf_dir, "events")
    tol = INTERVAL_JOIN_TOLERANCE_US
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        F.unix_micros("ts").alias("t_err"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("t_pur")
    )
    b_err = F.floor(F.col("t_err") / F.lit(tol)).cast("long")
    err_exploded = err.withColumn(
        "bucket", F.explode(F.array(b_err - 1, b_err, b_err + 1))
    )
    pur_bucketed = pur.withColumn(
        "bucket", F.floor(F.col("t_pur") / F.lit(tol)).cast("long")
    )
    pairs = err_exploded.join(pur_bucketed, "bucket").filter(
        F.abs(F.col("t_err") - F.col("t_pur")) <= tol
    )
    return (
        pairs.groupBy(F.date_trunc("hour", "error_ts").alias("hour_ts"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("error_id").alias("n_errors"),
        )
        .select(fmt_ts("hour_ts").alias("hour"), "n_pairs", "n_errors")
        .orderBy("hour")
    )
