"""Multi-resolution rollup cascade + approximate (sketch) aggregates.

The hypertable-style pre-aggregation pattern: minute partials from raw,
hourly FROM the minute partials, daily FROM the hourly — each level
re-aggregates the one below, never the raw events.  At 100 TB/day the raw
table is touched exactly once (the minute pass); every coarser resolution
and every dashboard query reads partials orders of magnitude smaller.
Correctness requires re-aggregatable (algebraic) state — counts and sums
(kept exact in DECIMAL), min/max — with ratios derived only at the final
level.  The DuckDB oracle aggregates daily STRAIGHT from raw, so the
parity check proves the cascade loses nothing.

Sketch aggregates (``approx_count_distinct`` = HyperLogLog++,
``approx_percentile`` = QuantileSummaries) are the same idea with bounded
state for non-algebraic measures; their error bounds are asserted in
tests against exact answers (no cross-engine oracle — sketch internals are
engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import fmt_ts, sum_dbl
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


def rollup_level(df: DataFrame, resolution: str, ts_col: str = "bucket") -> DataFrame:
    """Re-aggregate partials one level coarser (partial → partial)."""
    return df.groupBy(
        F.date_trunc(resolution, ts_col).alias("bucket"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_sum").alias("value_sum"),  # stays DECIMAL — exact
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
    )


def minute_partials(events: DataFrame) -> DataFrame:
    """The single pass over raw events (leaf of the cascade)."""
    return events.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


@register(
    "q61_rollup_cascade",
    headline=True,
    oracle="""
    SELECT
      strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S.%f') AS day,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      MIN(value) AS value_min,
      MAX(value) AS value_max,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def q61_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals computed through the minute→hour→day cascade; the
    oracle aggregates daily directly from raw — equality proves the
    partial re-aggregation is lossless."""
    ev = load_table(spark, sf_dir, "events")
    minute = minute_partials(ev)
    hour = rollup_level(minute, "hour")
    day = rollup_level(hour, "day")
    return day.select(
        fmt_ts("bucket").alias("day"),
        "event_type",
        "n_events",
        F.col("value_sum").cast("double").alias("total_value"),
        "value_min",
        "value_max",
        (F.col("value_sum").cast("double") / F.col("n_events")).alias("avg_value"),
    ).orderBy("day", "event_type")


@register("q99_hll_sketch_union", oracle=None)  # sketch binary is engine-private
def q99_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the pre-aggregation form of
    COUNT(DISTINCT) at 100 TB: build one HLL sketch per (day, event_type)
    (the expensive pass over raw data, stored with the daily partials),
    then answer coarser questions by UNIONING sketches — per event_type
    across all days, and globally — without touching raw events again.
    Error bound vs exact asserted in tests/test_approx_aggregates.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    per_type = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_users"),
        F.count("*").alias("n_days"),
    )
    total = daily.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_users"),
        F.count("*").alias("n_days"),
    )
    return per_type.unionByName(total).orderBy("event_type")


@register("q62_approx_aggregates", oracle=None)  # sketch internals are
# engine-specific; error bounds asserted vs exact in tests
def q62_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state distinct counts and percentiles: HyperLogLog++ and
    QuantileSummaries.  The 100 TB variants of COUNT(DISTINCT) / exact
    rank selection — O(1) state per group instead of O(distinct values)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.approx_percentile("value", [0.5, 0.9, 0.99], 10_000).alias(
                "value_pcts"
            ),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_pcts")[0].alias("p50"),
            F.col("value_pcts")[1].alias("p90"),
            F.col("value_pcts")[2].alias("p99"),
            "n_events",
        )
        .orderBy("event_type")
    )
