"""transformWithStateInPandas: bounded per-key top-k state must carry
across micro-batches and converge to the batch answer (state is
order-insensitive — a max-heap — so any file split works)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.streaming.jobs import (
    read_event_stream,
    run_to_memory_sink,
)
from pyspark_anomaly_detection_spark.streaming.state_v2 import (
    STATE_V2_AVAILABLE,
    TOP_K,
    stateful_user_topk,
)

pytestmark = pytest.mark.skipif(
    not STATE_V2_AVAILABLE,
    reason="transformWithStateInPandas needs google.protobuf (absent in "
    "this container); applyInPandasWithState ops are the tested path here",
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_v2"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_stateful_topk_matches_batch(spark, sf_dir, event_stream_dir):
    stream = read_event_stream(spark, event_stream_dir, max_files_per_trigger=1)
    run_to_memory_sink(
        stateful_user_topk(stream), "topk_sink", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    final = {
        r.user_id: (list(r.topk), r.n_seen)
        for r in spark.table("topk_sink")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }

    ev = load_table(spark, sf_dir, "events")
    wb = Window.partitionBy("user_id").orderBy(F.desc("value"))
    batch_topk = (
        ev.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") <= TOP_K)
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list("value"), asc=False).alias("topk"),
            F.count("*").alias("k"),
        )
    )
    batch_counts = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    batch = {r.user_id: list(r.topk) for r in batch_topk.collect()}

    assert final.keys() == batch.keys()
    for uid, (topk, n_seen) in final.items():
        assert topk == batch[uid], uid
        assert n_seen == batch_counts[uid]
