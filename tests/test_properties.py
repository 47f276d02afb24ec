"""Property-based tests (hypothesis) for the hand-built operators whose
semantics aren't pinned by a SQL oracle: as-of join, salted aggregation,
gap sessionization, distributed running sum.  Each property is checked
against a straightforward Python reference implementation on small random
inputs — the adversarial-input complement to the fixed-corpus oracle
suite (SURVEY §5.2)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.events.analytics import sessionize
from pyspark_anomaly_detection_spark.events.temporal import distributed_running_sum
from pyspark_anomaly_detection_spark.relational.advanced import salted_aggregate
from pyspark_anomaly_detection_spark.windows.features import asof_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = datetime(2024, 1, 1)

ts_offsets = st.integers(min_value=0, max_value=3 * 24 * 3600)
keys = st.integers(min_value=0, max_value=3)
values = st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 100.0)


@SETTINGS
@given(
    left=st.lists(st.tuples(keys, ts_offsets), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, ts_offsets, values), min_size=0, max_size=25),
)
def test_asof_join_matches_naive(spark, left, right):
    left_rows = [
        (i, k, EPOCH + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    right_rows = [
        (k, EPOCH + timedelta(seconds=s), v) for k, s, v in right
    ]
    ldf = spark.createDataFrame(left_rows, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "user_id long, ts timestamp, value double")
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(
            ldf, rdf, on="user_id", right_cols=("value",)
        ).collect()
    }
    for event_id, key, lts in left_rows:
        candidates = [rts for rk, rts, _ in right_rows if rk == key and rts <= lts]
        want = max(candidates) if candidates else None
        assert got[event_id] == want, (event_id, got[event_id], want)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "hot"]), values), min_size=1, max_size=60
    )
)
def test_salted_aggregate_matches_plain(spark, rows):
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        r.k: (r.n_events, r.total_value)
        for r in salted_aggregate(df, "k", "value").collect()
    }
    want: dict[str, list] = {}
    for k, v in rows:
        agg = want.setdefault(k, [0, 0.0])
        agg[0] += 1
        # mirror the engine's DECIMAL(18,2) exact accumulation in cents
        agg[1] += round(v * 100)
    for k, (n, cents) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(cents / 100.0, abs=1e-9)


@SETTINGS
@given(
    rows=st.lists(st.tuples(keys, ts_offsets), min_size=1, max_size=40, unique=True)
)
def test_sessionize_gap_property(spark, rows):
    data = [
        (i, k, EPOCH + timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, gap_minutes=30).select(
        "user_id", "ts", "session_seq"
    ).collect()
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append((r.ts, r.session_seq))
    for user, items in per_user.items():
        items.sort()
        for (t0, s0), (t1, s1) in zip(items, items[1:]):
            gap = (t1 - t0).total_seconds()
            if gap > 1800:
                assert s1 == s0 + 1, "gap exceeded → must open a new session"
            else:
                assert s1 == s0, "within gap → must stay in the session"


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 1000), st.sampled_from([-1, 1])),
        min_size=1,
        max_size=50,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_distributed_running_sum_matches_sequential(spark, rows):
    df = spark.createDataFrame(rows, "part int, seq int, delta int")
    got = {
        (r.part, r.seq): r.running
        for r in distributed_running_sum(
            df, "part", [F.col("seq")], "delta"
        ).collect()
    }
    acc = 0
    for part, seq, delta in sorted(rows):
        acc += delta
        assert got[(part, seq)] == acc
