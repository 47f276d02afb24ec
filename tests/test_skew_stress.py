"""Skew stress: the salted paths must EQUAL their unsalted twins and
actually pay under a celebrity key.

test_scale_smoke proves 20M uniform rows complete; this file proves the
skew story: one user holding 10% of all events — the shape that melts a
per-key window exchange (AQE's skew-join splitting does not apply to
window exchanges, so without salting the hot key's whole history lands
on ONE task).  Calibration on local[8]: at 1.5M rows the unsalted plan
takes ~10 s against ~4.5 s salted (ratio ≈ 0.45); the asserted bound of
0.8 leaves 2× noise headroom while still failing if the salt ever stops
paying.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.relational.skew import salted_join
from pyspark_anomaly_detection_spark.windows.salted import (
    salted_trailing_window,
    unsalted_trailing_window,
)

N_ROWS = 1_500_000
N_COLD_USERS = 20_000
SPAN_US = 48 * 3_600_000_000  # 48 h of event time → ~48 one-hour chunks


@pytest.fixture(scope="module")
def hot_key_events(spark):
    """10% of rows on user 'hot', the rest uniform over 20k users; event
    times spread over 48 h so the chunk salt has ~48 shards to use."""
    ev = (
        spark.range(N_ROWS, numPartitions=16)
        .select(
            F.when(F.pmod("id", F.lit(10)) == 0, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("u"),
                    F.pmod(F.xxhash64("id"), F.lit(N_COLD_USERS)).cast("string"),
                )
            )
            .alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(SPAN_US))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).alias("value"),
        )
        .persist()
    )
    ev.count()  # materialize before timing anything
    yield ev
    ev.unpersist()


def _window_checksum(df):
    """Order-independent full-result checksum: counts, exact long sums,
    and a per-row hash sum — equality here means row-level equality with
    overwhelming probability, without collecting 1.5M rows."""
    return tuple(
        df.agg(
            F.count("*"),
            F.sum("w_count"),
            F.sum("w_sum"),
            F.sum(F.hash("user_id", "ts", "w_count", "w_sum").cast("long")),
        ).collect()[0]
    )


def test_salted_window_equal_and_salted_plan_shape(hot_key_events):
    """Hard asserts are EQUALITY and the PLAN property (the salt column
    participates in the window partitioning, so the hot key spreads over
    its time chunks); the wall-clock ratio is advisory only — timing
    assertions flake on contended hosts (round-3 ADVICE)."""
    from pyspark_anomaly_detection_spark import plans

    salted_df = salted_trailing_window(hot_key_events)
    plain_df = unsalted_trailing_window(hot_key_events)

    # plan property: salted window partitions by (user_id, _home) — the
    # chunk salt must reach the Window operator's partition spec; the
    # unsalted twin must NOT have it.
    salted_plan = plans.formatted_plan(salted_df)
    plain_plan = plans.formatted_plan(plain_df)
    assert "_home" in salted_plan, "chunk salt missing from salted window plan"
    assert "_home" not in plain_plan

    t0 = time.perf_counter()
    plain = _window_checksum(plain_df)
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    salted = _window_checksum(salted_df)
    t_salted = time.perf_counter() - t0

    assert salted == plain
    ratio = t_salted / t_plain
    if ratio >= 0.8:  # advisory: calibrated ~0.45 on idle local[8]
        import warnings

        warnings.warn(
            f"salted window advisory: ratio {ratio:.2f} >= 0.8 "
            f"({t_salted:.1f}s salted vs {t_plain:.1f}s plain) — "
            "expected <0.8 on an idle host",
            stacklevel=1,
        )


def test_salted_join_equals_plain_under_skew(hot_key_events, spark):
    """salted_join vs the plain shuffle join on the same skewed keys:
    identical row multiset (count + hash checksum).  Broadcast is
    disabled so both sides actually exercise the shuffled-join path the
    salt exists for."""
    dim = spark.createDataFrame(
        [("hot", 0)] + [(f"u{i}", i % 23) for i in range(N_COLD_USERS)],
        "user_id string, cohort long",
    )
    fact = hot_key_events

    def checksum(df):
        return tuple(
            df.agg(
                F.count("*"),
                F.sum("cohort"),
                F.sum(F.hash("user_id", "ts", "value", "cohort").cast("long")),
            ).collect()[0]
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = checksum(fact.join(dim, "user_id"))
        salted = checksum(
            salted_join(fact, dim.withColumnRenamed("user_id", "d_user"),
                        "user_id", "d_user").drop("d_user")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert salted == plain
