"""Event analytics: gap-based sessionization, funnel analysis, retention
cohorts — the query shapes a product/training-data pipeline runs over an
events stream, all expressed as single declarative plans (windows + keyed
aggregation; one shuffle on ``user_id`` each).

Gap sessionization is the batch/window formulation (lag → gap flag →
running sum = session id); the built-in ``session_window`` version of the
same semantics is ``q26_session_windows``.  Both exist because at 100 TB
the window formulation composes with arbitrary per-session aggregates and
reuses an existing ``user_id`` partitioning, while ``session_window``
is the streaming-capable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import fmt_ts
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

SESSION_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    One shuffle (partition by user), two window passes over it: lag for
    the gap flag, running sum for the id.  Session id is (user, seq) —
    globally unique without any driver-side coordination.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.withColumn(
        "_new_session",
        F.when(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
            > gap_us,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")


@register(
    "q63_sessionization_gap",
    headline=True,
    oracle=f"""
    WITH flagged AS (
      SELECT
        user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60 * 1_000_000}
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT
        user_id, ts,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT
      user_id,
      session_seq,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q63_sessionization_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            fmt_ts(F.min("ts")).alias("session_start"),
            fmt_ts(F.max("ts")).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "q64_funnel",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    first_click AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN first_view f ON e.user_id = f.user_id
      WHERE e.event_type = 'click' AND e.ts > f.v_ts
      GROUP BY e.user_id
    ),
    first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN first_click f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND e.ts > f.c_ts
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM first_view) AS n_viewed,
      (SELECT COUNT(*) FROM first_click) AS n_clicked_after_view,
      (SELECT COUNT(*) FROM first_purchase) AS n_purchased_after_click
    """,
)
def q64_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each stage keeps users whose
    first stage-event strictly follows their previous stage's first event.

    SINGLE-SCAN formulation (round 4; was 6 scans / 9 shuffles as
    per-stage broadcast joins): the three stage timestamps are cascaded
    per-user window minima over ONE pass of the filtered events —
    ``c_ts = min(click ts > v_ts)`` can reference ``v_ts`` because the
    unbounded window computed it in the same partition, and all three
    Window ops share one ``partitionBy(user_id)`` exchange (Catalyst
    reuses the sort/partitioning; PLAN_AUDIT: events×1, 3 shuffles).
    Nulls cascade exactly like the join chain: no view ⇒ v_ts null ⇒
    the click predicate is null ⇒ c_ts null ⇒ p_ts null.  Skew bound:
    a celebrity user's events land in one window partition — identical
    to the old per-stage groupBy, not a regression."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t = F.col("event_type")
    per_event = (
        ev.filter(t.isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn("v_ts", F.min(F.when(t == "view", F.col("ts"))).over(w))
        .withColumn(
            "c_ts",
            F.min(
                F.when((t == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (t == "purchase") & (F.col("ts") > F.col("c_ts")), F.col("ts")
                )
            ).over(w),
        )
    )
    per_user = per_event.groupBy("user_id").agg(
        F.first("v_ts").alias("v_ts"),
        F.first("c_ts").alias("c_ts"),
        F.first("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked_after_view"),
        F.count("p_ts").alias("n_purchased_after_click"),
    )


@register(
    "q65_retention_cohorts",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             date_trunc('week', e.ts) AS activity_week
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
    )
    SELECT
      strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
      CAST(floor(date_diff('day', cohort_week, activity_week) / 7.0) AS BIGINT)
        AS week_offset,
      COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def q65_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen week, counted
    once per active week offset.  The cohort map is per-user (small) and
    broadcast back onto events."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(cohorts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", "ts").alias("activity_week"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7.0
            ).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )
