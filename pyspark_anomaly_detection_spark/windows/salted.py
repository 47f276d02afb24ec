"""Skew-salted trailing range windows for algebraic aggregates.

The celebrity-key problem for *windows*: ``Window.partitionBy(user)`` puts
every row of a hot user into ONE task — AQE skew-join splitting does not
apply to window exchanges, so a user with 10⁸ events stalls the stage
(documented risk, ``windows/features.py`` module notes).  Salting a join
key is easy; salting a window is not, because a row's frame needs other
rows of the same key — a random salt would tear frames apart.

The fix for **trailing range frames** of width W with **algebraic**
aggregates (count/sum — and avg as sum/count): salt by TIME CHUNK instead
of randomly.

1. Chunk time into width-W buckets: ``chunk = floor(ts / W)``.  A trailing
   frame ``[t-W, t]`` can only touch rows in ``chunk(t)`` and
   ``chunk(t)-1``.
2. Emit each row twice: once into its home chunk partition (real), once
   into the NEXT chunk's partition (ghost — it may contribute to frames
   there).  This is the standard range-join duplication bound: exactly 2×.
3. Run the plain range window partitioned by ``(key, chunk)`` — every
   frame's contributors are now inside one partition — and drop ghosts.

The hot key's rows now spread over ``(key, n_chunks)`` tasks: parallelism
scales with the time span instead of being capped at one task per key.
Cost: 2× shuffled rows.  Exactness: bit-exact for count and for sums over
exact types (int/long/decimal); float sums can differ in accumulation
order exactly as any repartitioned sum does.

Holistic frame aggregates (collect_set distinct counts, medians) do NOT
decompose this way — for those, bound the key depth or switch to sketches
(``merchant_diversity_approx``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_HOUR = 3_600_000_000


def salted_trailing_window(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = US_PER_HOUR,
    count_col: str = "w_count",
    sum_col: str = "w_sum",
) -> DataFrame:
    """Trailing ``[t - window_us, t]`` count + sum per key, chunk-salted.

    Returns ``df`` plus ``count_col``/``sum_col`` — same contract as the
    unsalted ``Window.partitionBy(key).orderBy(ts).rangeBetween(-W, 0)``
    (property-tested equal), but the shuffle key is ``(key, time-chunk)``
    so hot keys parallelize across their time span.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    base = df.withColumn("_ts_us", ts_us).withColumn(
        "_chunk", F.floor(F.col("_ts_us") / F.lit(window_us))
    )
    real = base.withColumn("_home", F.col("_chunk")).withColumn(
        "_ghost", F.lit(False)
    )
    ghost = base.withColumn("_home", F.col("_chunk") + 1).withColumn(
        "_ghost", F.lit(True)
    )
    both = real.unionByName(ghost)

    w = (
        Window.partitionBy(partition_col, "_home")
        .orderBy("_ts_us")
        .rangeBetween(-window_us, 0)
    )
    return (
        both.withColumn(count_col, F.count("*").over(w))
        .withColumn(sum_col, F.sum(value_col).over(w))
        .filter(~F.col("_ghost"))
        .drop("_ts_us", "_chunk", "_home", "_ghost")
    )


def unsalted_trailing_window(
    df: DataFrame,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = US_PER_HOUR,
    count_col: str = "w_count",
    sum_col: str = "w_sum",
) -> DataFrame:
    """The reference plan the salted variant must equal — one partition per
    key (the thing that melts on celebrity keys)."""
    ts_us = F.unix_micros(F.col(ts_col))
    base = df.withColumn("_ts_us", ts_us)
    w = (
        Window.partitionBy(partition_col)
        .orderBy("_ts_us")
        .rangeBetween(-window_us, 0)
    )
    return (
        base.withColumn(count_col, F.count("*").over(w))
        .withColumn(sum_col, F.sum(value_col).over(w))
        .drop("_ts_us")
    )
