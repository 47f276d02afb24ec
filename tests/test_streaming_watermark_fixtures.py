"""Watermark-semantics oracle fixtures (SURVEY §7.4, VERDICT r7 item 6):
hand-computed expected outputs for the streaming twins of q24 (tumbling)
and q26 (sessions) under late/out-of-order arrival.

There is no DuckDB oracle for watermark semantics — the expectation
tables below ARE the oracle, derived by hand from Spark's documented
rules and asserted EXACTLY:

* the watermark is (max event time seen at the end of a batch − delay),
  applied to the NEXT batch;
* a late row whose window (or prospective session) has been finalized
  (end ≤ watermark) is dropped and resurrects nothing;
* a late-but-inside-horizon row still merges into open state;
* append mode emits a window/session exactly once, when the watermark
  passes its end; state never emitted stays unemitted at stream end.

Mechanics: one ``availableNow`` run per arrival batch over a SHARED
checkpoint — the watermark persists in the checkpoint, so batch
boundaries (and therefore watermark advancement) are fully
deterministic, unlike maxFilesPerTrigger file ordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.streaming.jobs import (
    read_event_stream,
    session_counts,
    tumbling_counts,
)
from pyspark_anomaly_detection_spark.streaming.watermark_replay import (
    SESSION_BATCHES,
    TUMBLING_BATCHES,
)


#: (test id, agg builder, batches in arrival order, expected final rows)
#:
#: Tumbling case (width 1 h, watermark 1 h, grouped by event_type) —
#: watermark trace:  after b1 max=11:05 → wm 10:05; after b2 max=12:10 →
#: wm 11:10 (finalizes [10:00,11:00)); after b3 max=13:05 → wm 12:05
#: (finalizes [11:00,12:00)).
#:   b2's A@09:30 is LATE beyond wm ([09:00,10:00) end ≤ 10:05): dropped.
#:   b3's A@11:20 is late-but-open ([11:00,12:00) end 12:00 > wm 11:10):
#:   merges with b1's A@11:05 → count 2.
#:   [12:00,13:00) and [13:00,14:00) never finalize: absent.
TUMBLING_CASE = (
    "tumbling_1h",
    lambda stream: tumbling_counts(stream, width="1 hour", watermark="1 hour"),
    # Arrival batches shared with the registered q205 replay query (the
    # expectations below stay independently hand-derived, so the query's
    # VALUES oracle and this test cross-check rather than share a truth).
    TUMBLING_BATCHES,
    lambda df: {
        (r.window_start.strftime("%H:%M"), r.event_type): r.n_events
        for r in df.collect()
    },
    {("10:00", "A"): 1, ("10:00", "B"): 1, ("11:00", "A"): 2},
)

#: Session case (gap 30 m, watermark 1 h, grouped by user_id) —
#: watermark trace: after b1 max=10:20 → wm 09:20; after b2 max=13:00 →
#: wm 12:00 (finalizes u1 [10:00,11:10) and u2 [10:05,10:35)); after b3
#: max=14:31 → wm 13:31 (finalizes u3 [13:00,13:30)).
#:   b2's u1@10:40 extends u1's open session 10:00–10:50 to 10:00–11:10
#:   (three events).
#:   b3's u1@10:45 is LATE (prospective session end 11:15 ≤ wm 12:00):
#:   dropped — it does NOT resurrect the already-emitted u1 session.
#:   u4's session never finalizes: absent.
SESSION_CASE = (
    "session_30m",
    lambda stream: session_counts(stream, gap="30 minutes", watermark="1 hour"),
    SESSION_BATCHES,
    lambda df: {
        (
            r.user_id,
            r.session_start.strftime("%H:%M"),
            r.session_end.strftime("%H:%M"),
        ): r.n_events
        for r in df.collect()
    },
    {
        (1, "10:00", "11:10"): 3,
        (2, "10:05", "10:35"): 1,
        (3, "13:00", "13:30"): 1,
    },
)


@pytest.mark.parametrize(
    "agg,batches,extract,expected",
    [TUMBLING_CASE[1:], SESSION_CASE[1:]],
    ids=[TUMBLING_CASE[0], SESSION_CASE[0]],
)
def test_watermark_fixture_exact(spark, tmp_path, agg, batches, extract, expected):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    for rows in batches:
        spark.createDataFrame(
            [(e, ts, u, t, 1.0, "{}") for e, ts, u, t in rows],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            agg(read_event_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    assert extract(spark.read.parquet(sink)) == expected
