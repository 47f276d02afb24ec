"""Structured Streaming surface (SURVEY.md §2.12 stretch goal).

The reference is batch-only; this engine exposes its event-time
aggregations under ``readStream`` as well — the transformation code is the
*same DataFrame logic* as ``events.time_windows`` (batch/streaming unified
API), plus watermarks for late-data state eviction.

Scale notes: streaming state (window aggregates, sessions) lives in the
state store keyed by (window, group key); the watermark bounds state size —
without it a 100 TB/day stream grows state forever.  ``availableNow``
triggers give batch-equivalent replay semantics, which is exactly how the
tests verify parity: stream the same parquet through the streaming plan and
compare to the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyspark_anomaly_detection_spark.functions import sum_dbl

#: Schema of the events stream as the ns-normalized reader presents it.
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: str | StructType = EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream (schema mandatory for streaming reads)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling window counts per event type — identical logic
    to the batch ``q24_tumbling_hourly``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            sum_dbl("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows per user — streaming form of
    ``q26_session_windows``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def clicks_to_purchases_join(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``horizon``.

    Both sides are watermarked so the state store can evict: a click older
    than (watermark + horizon) can never match a future purchase and is
    dropped.  Without the time bound the join state grows with the full
    stream — the unbounded-state mistake this operator exists to avoid.
    The batch formulation of the same semantics is a range join on
    (user_id, time interval), which is how the test verifies it.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user = p_user
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {horizon}
            """
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


def dedup_event_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop replays of the same event_id arriving
    within the watermark horizon (at-least-once sources redeliver; this
    makes the downstream exactly-once with O(events-per-horizon) state,
    evicted as the watermark advances — unbounded dropDuplicates state is
    the classic streaming leak)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Execute a streaming plan to completion with the availableNow trigger
    (batch-equivalent replay) into an in-memory table named ``query_name``."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    watermark: str = "2 hours",
    width: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: the standard
    "join the stream to a dimension snapshot" pattern.  The static side
    is broadcast per micro-batch (no state, unlike stream-stream joins —
    the dim is re-resolvable, so late data needs no buffered rows), then
    aggregated by (window, dim attribute).  At 100 TB/day the dim
    broadcast is the difference between a stateless per-batch hash join
    and an unbounded shuffle-state join."""
    joined = events.withWatermark("ts", watermark).join(F.broadcast(dim), on)
    return (
        joined.groupBy(F.window("ts", width), "cohort")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct(on).alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "cohort",
            "n_events",
            "approx_users",
        )
    )
