"""Streaming/batch parity: the same event-time aggregations produce the
same results under Structured Streaming (availableNow replay) as in batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.streaming.jobs import (
    clicks_to_purchases_join,
    dedup_event_stream,
    read_event_stream,
    run_to_memory_sink,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a multi-file parquet dir (streaming file
    source needs a directory it can incrementally list)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, sf_dir, event_stream_dir):
    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=2)
    run_to_memory_sink(tumbling_counts(stream), "tumbling_sink")
    streamed = (
        spark.table("tumbling_sink")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    batch = (
        tumbling_counts(load_table(spark, sf_dir, "events").withWatermark("ts", "2 hours"))
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert streamed.equals(batch)


def test_session_stream_matches_batch(spark, sf_dir, event_stream_dir):
    stream = read_event_stream(spark, event_stream_dir)
    run_to_memory_sink(session_counts(stream), "session_sink")
    streamed = (
        spark.table("session_sink").orderBy("user_id", "session_start").toPandas()
    )
    batch = (
        session_counts(load_table(spark, sf_dir, "events"))
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    assert streamed.equals(batch)


def test_stream_stream_join_matches_batch_range_join(
    spark, sf_dir, event_stream_dir
):
    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=2)
    run_to_memory_sink(
        clicks_to_purchases_join(stream), "ssjoin_sink", output_mode="append"
    )
    streamed = {
        (r.purchase_id, r.click_id)
        for r in spark.table("ssjoin_sink").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            ),
        ).collect()
    }
    assert batch, "fixture produced no click→purchase pairs"
    assert streamed == batch


def test_stream_dedup_drops_replays(spark, sf_dir, tmp_path):
    """Write the events twice (simulated at-least-once redelivery within
    the horizon); the deduped stream must contain each event_id once."""
    raw = str(tmp_path / "replayed")
    ev = load_table(spark, sf_dir, "events")
    ev.write.parquet(raw)
    ev.write.mode("append").parquet(raw)  # replay of every event

    stream = read_event_stream(spark, raw, max_files_per_trigger=2)
    run_to_memory_sink(
        dedup_event_stream(stream), "dedup_sink", output_mode="append"
    )
    got = spark.table("dedup_sink")
    n_unique = ev.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_watermark_present_in_plan(spark, event_stream_dir):
    stream = tumbling_counts(read_event_stream(spark, event_stream_dir))
    assert stream.isStreaming
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_python_stream_source_prefix_matches_batch(spark):
    """The streaming Python DataSource must emit exactly the batch
    source's rows, in offset order — micro-batch boundaries are an
    execution detail, not a semantics change (stream prefix == batch
    head)."""
    import time

    from pyspark_anomaly_detection_spark.io.pydatasource import (
        STREAM_READER_AVAILABLE,
        register_python_datasource,
        register_stream_datasource,
    )

    if not STREAM_READER_AVAILABLE:
        import pytest

        pytest.skip("SimpleDataSourceStreamReader not available")

    register_stream_datasource(spark)
    register_python_datasource(spark)
    q = (
        spark.readStream.format("synthetic_events_stream")
        .option("batch_rows", 50)
        .load()
        .writeStream.format("memory")
        .queryName("_pystream_sink")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM _pystream_sink").first().n >= 150:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    streamed = {
        tuple(r)
        for r in spark.sql(
            "SELECT row_id, bucket, score FROM _pystream_sink"
        ).collect()
    }
    assert len(streamed) >= 150
    n = len(streamed)
    batch_head = {
        tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("rows", n)
        .load()
        .collect()
    }
    assert streamed == batch_head


def test_stream_static_enrichment_matches_batch(spark, sf_dir, event_stream_dir):
    """Stream-static broadcast join: per-micro-batch dim resolution must
    reproduce the batch join exactly (no state, no dropped rows)."""
    from pyspark_anomaly_detection_spark.streaming.jobs import enrich_with_dimension

    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.pmod("user_id", F.lit(5)))
    )
    dim.cache().count()  # freeze the snapshot both runs see

    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=2)
    run_to_memory_sink(enrich_with_dimension(stream, dim), "enrich_sink")
    streamed = (
        spark.table("enrich_sink").orderBy("window_start", "cohort").toPandas()
    )
    batch = (
        enrich_with_dimension(load_table(spark, sf_dir, "events"), dim)
        .orderBy("window_start", "cohort")
        .toPandas()
    )
    dim.unpersist()
    assert streamed.equals(batch)


def test_rate_source_smoke(spark):
    """The built-in rate source (load-generator for streaming tests):
    rows arrive with monotonically increasing value and a timestamp."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .writeStream.format("memory")
        .queryName("_rate_sink")
        .start()
    )
    import time

    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM _rate_sink").first().n >= 20:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT value FROM _rate_sink ORDER BY value").collect()
    assert len(rows) >= 20
    vals = [r.value for r in rows]
    assert vals == sorted(set(vals))  # monotone, no duplicates


def test_late_data_dropped_beyond_watermark(spark, tmp_path):
    """Hand-built late-data expectation (SURVEY §7.4): a row older than the
    watermark must be DROPPED from an append-mode windowed aggregation; a
    row inside the horizon must still land.

    Mechanics: the watermark persists in the checkpoint across restarts, so
    two availableNow runs over the same checkpoint give deterministic
    late-data semantics — run 1 advances the watermark past window W1's
    end (finalizing it); run 2 delivers a W1-timestamped row (late, beyond
    watermark → dropped) plus on-time rows.

    Timeline (watermark delay 1 h, 1 h tumbling windows, counts by type):
      run 1: A@10:10, A@10:20, B@12:30   → max ts 12:30, watermark 11:30
             → [10:00,11:00) FINAL: (A, 2) emitted
      run 2: A@10:40 (LATE: 10:40 < 11:30 → dropped)
             B@12:40 (on time, joins open window [12:00,13:00))
             C@14:30 (advances watermark to 13:30 → finalizes [12:00,13:00))
             → emitted (B, 2) — the late A row resurrects nothing.
    """
    import os

    from pyspark_anomaly_detection_spark.streaming.jobs import (
        read_event_stream,
        tumbling_counts,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        stream = read_event_stream(spark, src)
        q = (
            tumbling_counts(stream, width="1 hour", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    D = "2023-06-01 "
    write_batch("b1", [
        (1, D + "10:10:00", 1, "A", 1.0, "{}"),
        (2, D + "10:20:00", 1, "A", 1.0, "{}"),
        (3, D + "12:30:00", 2, "B", 1.0, "{}"),
    ])
    run_once()

    write_batch("b2", [
        (4, D + "10:40:00", 1, "A", 1.0, "{}"),   # LATE: beyond watermark
        (5, D + "12:40:00", 2, "B", 1.0, "{}"),   # on time
        (6, D + "14:30:00", 3, "C", 1.0, "{}"),   # advances watermark
    ])
    run_once()

    out = {
        (r.window_start.strftime("%H:%M"), r.event_type): r.n_events
        for r in spark.read.parquet(sink).collect()
    }
    # finalized windows only; the late A@10:40 appears NOWHERE and the
    # on-time B@12:40 counts — both hand-computed above
    assert out == {("10:00", "A"): 2, ("12:00", "B"): 2}, out
