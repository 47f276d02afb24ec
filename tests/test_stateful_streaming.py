"""Custom stateful operators (applyInPandasWithState): state carried
across micro-batches must reproduce the batch answer.

* Totals: commutative state — the final update per user equals the batch
  group-by no matter how files split into micro-batches.
* Spikes: order-dependent state — verified against the batch window
  formulation (running prior mean) on a single-batch replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.streaming.jobs import (
    read_event_stream,
    run_to_memory_sink,
)
from pyspark_anomaly_detection_spark.streaming.stateful import (
    detect_value_spikes,
    stateful_user_totals,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stateful"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_stateful_totals_across_batches_match_batch_groupby(
    spark, sf_dir, event_stream_dir
):
    # One file per micro-batch → state must carry across 4 batches.
    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=1)
    run_to_memory_sink(
        stateful_user_totals(stream), "totals_sink", output_mode="update"
    )
    # Per user, n_events is monotone across updates: the max row is final.
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        spark.table("totals_sink")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    final_counts = {r.user_id: r.n_events for r in final.collect()}
    batch_counts = {r.user_id: r.n_events for r in batch.collect()}
    assert final_counts == batch_counts


def test_stateful_totals_values_match_batch_sums(spark, sf_dir, event_stream_dir):
    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=2)
    run_to_memory_sink(
        stateful_user_totals(stream), "totals_sink2", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {
        r.user_id: r.total_value
        for r in spark.table("totals_sink2")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    batch = {
        r.user_id: r.total
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, total in batch.items():
        assert abs(final[uid] - total) < 1e-6 * max(1.0, abs(total))


def test_spike_detector_matches_batch_window(spark, sf_dir, event_stream_dir):
    stream = read_event_stream(spark, event_stream_dir)  # single micro-batch
    run_to_memory_sink(
        detect_value_spikes(stream), "spikes_sink", output_mode="append"
    )
    streamed = {
        (r.event_id, r.n_prior): r.prior_mean
        for r in spark.table("spikes_sink").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        (r.event_id, r.n_prior): r.prior_mean
        for r in ev.select(
            "event_id",
            "value",
            F.count("*").over(w).alias("n_prior"),
            F.avg("value").over(w).alias("prior_mean"),
        )
        .filter(
            (F.col("n_prior") >= 5) & (F.col("value") > 2.0 * F.col("prior_mean"))
        )
        .collect()
    }
    assert streamed.keys() == expected.keys()
    assert expected, "fixture produced no spikes — threshold needs adjusting"
    for key, mean in expected.items():
        assert abs(streamed[key] - mean) < 1e-9 * max(1.0, abs(mean))
