"""foreachBatch incremental gold: multi-batch streaming maintenance must
converge to the batch aggregate, and a late-arriving file must reopen and
correct only its day's partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.streaming.incremental import (
    daily_gold,
    start_incremental_gold,
)
from pyspark_anomaly_detection_spark.streaming.jobs import read_event_stream


def _gold_dict(df):
    return {
        (str(r.day), r.event_type): (r.n_events, float(r.value_sum))
        for r in df.collect()
    }


def test_incremental_gold_converges_to_batch(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.parquet(raw)

    stream = read_event_stream(spark, raw, max_files_per_trigger=1)
    q = start_incremental_gold(stream, gold, raw, ckpt)
    q.awaitTermination()

    got = _gold_dict(spark.read.parquet(gold))
    want = _gold_dict(daily_gold(events))
    assert got == want


def test_late_file_corrects_only_its_day(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    first_day = events.agg(F.min(F.to_date("ts"))).collect()[0][0]
    on_time = events.filter(F.to_date("ts") != F.lit(first_day))
    late = events.filter(F.to_date("ts") == F.lit(first_day))

    on_time.write.parquet(raw)
    stream = read_event_stream(spark, raw, max_files_per_trigger=2)
    start_incremental_gold(stream, gold, raw, ckpt).awaitTermination()
    assert (
        spark.read.parquet(gold)
        .filter(F.col("day") == F.lit(first_day))
        .count()
        == 0
    )

    # late data lands; the restarted availableNow stream picks up only the
    # new file (checkpoint) and repairs the first day's partition
    late.write.mode("append").parquet(raw)
    stream2 = read_event_stream(spark, raw, max_files_per_trigger=2)
    start_incremental_gold(stream2, gold, raw, ckpt).awaitTermination()

    got = _gold_dict(spark.read.parquet(gold))
    want = _gold_dict(daily_gold(events))
    assert got == want
