"""Chunk-salted trailing range windows: must equal the unsalted plan
exactly (algebraic aggregates, exact value types) while sharding hot keys
across time chunks."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.windows.salted import (
    US_PER_HOUR,
    salted_trailing_window,
    unsalted_trailing_window,
)


@pytest.fixture(scope="module")
def skewed_events(spark):
    """One celebrity key holding ~70% of rows + a tail of normal keys;
    timestamps cluster to create dense frames, values are longs so sums
    are order-independent."""
    rng = random.Random(7)
    rows = []
    base = 1_700_000_000  # epoch seconds
    for i in range(4000):
        user = "celebrity" if rng.random() < 0.7 else f"u{rng.randint(1, 20)}"
        # cluster into a 12-hour band, sub-second jitter to exercise
        # microsecond frame edges
        ts = base + rng.randint(0, 12 * 3600) + rng.random()
        rows.append((user, float(ts), rng.randint(1, 100)))
    return (
        spark.createDataFrame(rows, "user_id string, epoch double, value long")
        .withColumn("ts", F.timestamp_seconds("epoch"))
        .drop("epoch")
        .persist()
    )


def _key(r):
    return (r.user_id, r.ts)


def test_salted_equals_unsalted(skewed_events):
    for window_us in (US_PER_HOUR, 6 * US_PER_HOUR):
        plain = {
            _key(r): (r.w_count, r.w_sum)
            for r in unsalted_trailing_window(
                skewed_events, window_us=window_us
            ).collect()
        }
        salted = {
            _key(r): (r.w_count, r.w_sum)
            for r in salted_trailing_window(
                skewed_events, window_us=window_us
            ).collect()
        }
        assert salted == plain, f"window_us={window_us}"


def test_salted_handles_chunk_boundary_rows(spark):
    """Hand-built boundary case: contributor exactly W before a row that
    sits exactly on a chunk boundary must be included (range bound is
    inclusive), via the ghost-row path."""
    rows = [
        ("u", "2023-01-01 00:30:00", 1),
        ("u", "2023-01-01 01:00:00", 2),  # frame [00:00, 01:00] → includes 00:30
        ("u", "2023-01-01 02:00:00", 4),  # frame [01:00, 02:00] → includes 01:00
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, value long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        r.ts.strftime("%H:%M"): (r.w_count, r.w_sum)
        for r in salted_trailing_window(df).collect()
    }
    assert out == {"00:30": (1, 1), "01:00": (2, 3), "02:00": (2, 6)}


def test_salted_shuffle_key_includes_chunk(skewed_events):
    """The point of the exercise: the window exchange must partition on
    (key, chunk), not the bare key — that's what breaks up the hot key."""
    from pyspark_anomaly_detection_spark import plans

    plan = plans.formatted_plan(salted_trailing_window(skewed_events))
    assert "_home" in plan, plan[:2000]
