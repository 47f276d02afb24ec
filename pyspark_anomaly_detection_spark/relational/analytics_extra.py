"""Histogram binning, co-occurrence analysis, and Bloom-filter join
pruning — distribution profiling and the pre-join filter pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

N_BINS = 20


def fixed_width_bucket(x: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Bucket index in [0, n_bins): floor((x−lo)/width), clamped.  Plain
    arithmetic (not an engine-specific width_bucket) so the same formula
    runs identically in the DuckDB oracle."""
    width = (hi - lo) / n_bins
    raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


@register(
    "q89_price_histogram",
    oracle=f"""
    SELECT
      LEAST(GREATEST(CAST(floor((o_totalprice - 0.0) / (500000.0 / {N_BINS})) AS BIGINT), 0),
            {N_BINS - 1}) AS bucket,
      COUNT(*) AS n_orders,
      CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
      CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q89_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order prices — the single-pass
    distribution profile (one hash aggregate on the bucket index; compare
    q59's equal-frequency ntile, which needs a sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            fixed_width_bucket(F.col("o_totalprice"), 0.0, 500_000.0, N_BINS).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q90_event_cooccurrence",
    oracle="""
    WITH per_user AS (
      SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users_both
    FROM per_user a JOIN per_user b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def q90_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence matrix: for each pair of event types, how many users
    produced both.  Distinct-reduce BEFORE the self-join (the per-user
    type set is tiny), so pair blow-up is bounded by |types|² per user,
    never by raw event counts."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.select("user_id", "event_type").distinct()
    a, b = per_user.alias("a"), per_user.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_users_both"))
        .orderBy("type_a", "type_b")
    )


def semi_prefilter(
    fact: DataFrame, keys: DataFrame, fact_key: str, key_col: str
) -> DataFrame:
    """Pre-join pruning: drop fact rows with no matching key BEFORE the
    expensive downstream join/shuffle, via a broadcast LEFT SEMI join on
    the (small, computed) key set.

    At 100 TB this is the difference between shuffling the whole fact
    table into a selective join and shuffling only the matching fraction.
    Spark's own runtime Bloom filter does the same thing automatically
    for shuffle-side joins (``spark.sql.optimizer.runtime.bloomFilter.
    enabled``, turned on in this engine's session factory) using the
    internal ``bloom_filter_agg``/``might_contain`` expressions — that
    path handles key sets too big to broadcast, with a bounded
    false-positive rate instead of exactness.  This helper is the
    explicit, exact form for broadcast-sized key sets.
    """
    pruned = fact.join(
        F.broadcast(keys.select(F.col(key_col).alias(fact_key)).distinct()),
        fact_key,
        "left_semi",
    )
    return pruned
