"""Histogram binning, co-occurrence analysis, and Bloom-filter join
pruning — distribution profiling and the pre-join filter pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


Z_BITS = 8  # bits per dimension in the interleaved key


def _zorder_spark(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of x and y.
    Pure integer shift/mask arithmetic — identical in the oracle SQL."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zorder_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _q115_oracle() -> str:
    z = _zorder_sql("(l_partkey % 256)", "(l_suppkey % 256)")
    return f"""
    WITH keyed AS (
      SELECT (l_partkey % 256) AS px, (l_suppkey % 256) AS sx,
             {z} AS zkey
      FROM lineitem
    )
    SELECT CAST(zkey >> 12 AS BIGINT) AS zbucket,
      COUNT(*) AS n,
      CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
      CAST(MIN(sx) AS BIGINT) AS min_sx, CAST(MAX(sx) AS BIGINT) AS max_sx
    FROM keyed
    GROUP BY zbucket
    ORDER BY zbucket
    """


@register("q115_zorder_layout", oracle=_q115_oracle())
def q115_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two join dimensions, plus the
    per-z-range min/max envelope that makes it useful: sorting a table by
    zkey before writing bounds BOTH dimensions within every file/bucket,
    so min/max footer stats skip files for predicates on either column —
    the multi-dimensional generalization of partition pruning (the
    mechanism behind Delta/Iceberg OPTIMIZE ZORDER, built from plain
    integer arithmetic).  The envelope widths in this result are the
    skipping quality metric: each of the 16 z-ranges spans ≤ a quarter of
    each dimension's domain."""
    li = load_table(spark, sf_dir, "lineitem")
    px = F.pmod(F.col("l_partkey"), F.lit(256))
    sx = F.pmod(F.col("l_suppkey"), F.lit(256))
    keyed = li.select(
        px.alias("px"), sx.alias("sx"), _zorder_spark(px, sx).alias("zkey")
    )
    return (
        keyed.groupBy(F.shiftright("zkey", 12).cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("px").alias("min_px"),
            F.max("px").alias("max_px"),
            F.min("sx").alias("min_sx"),
            F.max("sx").alias("max_sx"),
        )
        .orderBy("zbucket")
    )


@register(
    "q150_pareto_skyline",
    oracle="""
    WITH m AS (
      SELECT p_size, MIN(p_retailprice) AS mp FROM part GROUP BY p_size
    ),
    s AS (
      SELECT p_size, mp,
             MIN(mp) OVER (ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS better
      FROM m
    )
    SELECT p_partkey, part.p_size, p_retailprice
    FROM part JOIN s ON part.p_size = s.p_size AND p_retailprice = mp
    WHERE better IS NULL OR better > mp
    ORDER BY part.p_size, p_partkey
    """,
)
def q150_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) operator: parts where no other part is
    simultaneously cheaper-or-equal AND bigger-or-equal (strict in one) —
    maximize p_size, minimize p_retailprice.

    NOT the textbook all-pairs dominance anti-join (O(N²) nested loop):
    in 2D the frontier factors into pure relational algebra — aggregate
    to (size, min_price) [one map-side-combinable shuffle, ≤|distinct
    sizes| rows], a running MIN over strictly-larger sizes on that tiny
    aggregate (a candidate survives iff no larger size achieves ≤ its
    price), then one broadcast join back to recover the surviving rows.
    Every step scales: the fact table is touched twice (agg + join), no
    self-join ever materializes.  Ties survive together on both engines —
    dominance is strict, and the boundary tests compare parquet-exact
    doubles, not derived floats."""
    part = load_table(spark, sf_dir, "part")
    m = part.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = (
        Window.orderBy(F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    surv = (
        m.withColumn("better", F.min("mp").over(w))
        .filter(F.col("better").isNull() | (F.col("better") > F.col("mp")))
        .select(F.col("p_size").alias("s_size"), "mp")
    )
    return (
        part.join(
            F.broadcast(surv),
            (part["p_size"] == F.col("s_size"))
            & (part["p_retailprice"] == F.col("mp")),
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    )
