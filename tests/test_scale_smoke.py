"""Empirical scale smoke: the shuffle-heavy paths at 20M rows.

The parquet fixtures top out at sf0.1 (~600k lineitem rows) — enough for
correctness, too small to surface memory/shuffle behavior.  This test
generates a 20M-row fact table in-memory (spark.range + hash-derived
columns, no I/O) and pushes it through the two wide patterns every
operator family here reduces to: a fact⋈dim join feeding a grouped
aggregation, and a per-key ranking window.  Assertions are consistency
invariants (no timing — CI boxes vary); the point is that the engine
completes a 33×-testdata workload in seconds on local[32] without GC
breakdown, which is the single-node proxy for "partitions sized sanely".
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_FACT = 20_000_000
N_USERS = 1_000_000


def _fact(spark):
    return spark.range(N_FACT, numPartitions=64).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(N_USERS)).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(97)).alias("bucket"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10000)) / F.lit(100.0)).alias(
            "amount"
        ),
    )


def test_join_agg_and_window_at_20m_rows(spark):
    fact = _fact(spark)
    dim = spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        F.pmod(F.xxhash64("id"), F.lit(23)).alias("cohort"),
    )

    agg = (
        fact.join(dim, "user_id")
        .groupBy("cohort", "bucket")
        .agg(F.count("*").alias("n"))
    )
    rows = agg.collect()
    # pmod keys are total: every fact row joins exactly one dim row
    assert sum(r.n for r in rows) == N_FACT
    assert len(rows) == 23 * 97  # every (cohort, bucket) cell is populated

    w = Window.partitionBy("user_id").orderBy("id")
    top2 = fact.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    n_top2 = top2.count()
    n_users_seen = fact.select("user_id").distinct().count()
    # 20M rows over 1M keys → essentially every key has ≥2 rows, and the
    # window must emit ≤ 2 per key, ≥ 1 per seen key
    assert n_users_seen <= n_top2 <= 2 * n_users_seen


def test_text_pipeline_at_1m_docs(spark):
    """North-star path at 20×-testdata doc volume: exact dedup (digest
    window) + quality scoring over 1M synthetic documents, with a known
    duplicate rate baked in so survivor count is exact."""
    from pyspark_anomaly_detection_spark.text.dedup import exact_dedup
    from pyspark_anomaly_detection_spark.text.stats import quality_columns

    n, distinct = 1_000_000, 900_000
    docs = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document text body number "),
            (F.col("id") % distinct).cast("string"),
            F.lit(" with some shared filler words appended"),
        ).alias("text"),
        F.lit("synthetic").alias("source"),
    )
    assert exact_dedup(docs).count() == distinct

    scored = docs.select("doc_id", *quality_columns(F.col("text")))
    assert scored.filter(F.col("n_tokens") >= 5).count() == n


def test_shard_and_sample_at_20m_rows(spark):
    """The sharding/sampling layer at 33×-testdata volume: md5-hash shard
    assignment stays balanced (every shard within 5% of uniform — the
    data-loader's epoch-planning assumption) and hash-threshold sampling
    is bit-deterministic under repartitioning (identical kept-count, no
    RNG, no partition dependence)."""
    from pyspark_anomaly_detection_spark.functions import md5_long60
    from pyspark_anomaly_detection_spark.text.shards import N_SHARDS, shard_assign

    n = 20_000_000
    rows = spark.range(n, numPartitions=64).select(F.col("id").alias("doc_id"))

    counts = {
        r.shard_id: r.n
        for r in shard_assign(rows).groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(counts) == N_SHARDS
    uniform = n / N_SHARDS
    assert all(abs(c - uniform) / uniform < 0.05 for c in counts.values()), counts

    kept = F.sum(
        (md5_long60(F.col("doc_id").cast("string")) % 10000 < 1000).cast("long")
    )
    a = rows.agg(kept.alias("k")).collect()[0].k
    b = rows.repartition(17).agg(kept.alias("k")).collect()[0].k
    assert a == b
    assert abs(a / n - 0.10) < 0.005  # ~10% rate, hash-uniform


def test_funnel_window_cascade_at_20m_rows(spark):
    """The q64 cascaded-window funnel shape at 20M events over 1M users:
    three per-user window minima in one partitioning must complete and
    produce funnel counts that are (a) monotone non-increasing down the
    funnel and (b) exactly reproduced by a direct groupBy formulation of
    the first stage."""
    ev = spark.range(N_FACT, numPartitions=64).select(
        F.pmod(F.xxhash64("id"), F.lit(N_USERS)).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("other")),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1_000_000_000)).alias("ts"),
    )
    w = Window.partitionBy("user_id")
    t = F.col("event_type")
    per_event = (
        ev.filter(t.isin("view", "click", "purchase"))
        .withColumn("v_ts", F.min(F.when(t == "view", F.col("ts"))).over(w))
        .withColumn(
            "c_ts",
            F.min(F.when((t == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(F.when((t == "purchase") & (F.col("ts") > F.col("c_ts")), F.col("ts"))).over(w),
        )
    )
    row = (
        per_event.groupBy("user_id")
        .agg(F.first("v_ts").alias("v"), F.first("c_ts").alias("c"), F.first("p_ts").alias("p"))
        .agg(
            F.count("v").alias("n_v"),
            F.count("c").alias("n_c"),
            F.count("p").alias("n_p"),
        )
        .collect()[0]
    )
    assert row.n_v >= row.n_c >= row.n_p > 0
    # stage-1 cross-check: users with ≥1 view, computed independently
    n_viewers = (
        ev.filter(t == "view").select("user_id").distinct().count()
    )
    assert row.n_v == n_viewers


def test_similarity_blocking_at_1m_docs(spark):
    """The blocking stack (round-5 verdict directive #5): MinHash
    banding (q34's generator) and the PPJoin prefix+length stage
    (q166's) at 1M synthetic docs — 2000× the sf0.001 gate, 20× the
    sf0.1 sweep.  The corpus plants exactly 100k duplicate pairs
    (id % 900k collisions) inside otherwise-unique 15-word texts drawn
    from a 50k-word hash vocabulary, so candidate counts have a known
    floor (every planted pair collides in every band / shares every
    prefix) and a LINEAR ceiling — the property that makes these the
    100-TB dedup path rather than an all-pairs bomb."""
    from pyspark_anomaly_detection_spark.text.dedup import minhash_lsh_pairs
    from pyspark_anomaly_detection_spark.text.setjoin import _prefix_stage

    n, distinct, words = 1_000_000, 900_000, 15
    planted = n - distinct
    docs = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64((F.col("id") % distinct) * 31 + i),
                        F.lit(50_000),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )

    n_banded = minhash_lsh_pairs(docs).count()
    # floor: identical texts collide in every band; ceiling: linear in n
    # (noise collisions between unique 13-shingle sets are rare)
    assert planted <= n_banded <= n, (planted, n_banded)

    _, cands = _prefix_stage(docs, 0.5)
    n_prefix = cands.count()
    assert planted <= n_prefix <= n, (planted, n_prefix)


def test_span_dedup_at_12m_tokens(spark):
    """The span-dedup family (round-6 verdict directive #3) at 12.8M
    corpus tokens — 200k docs × 64 tokens, ~40× the sf0.1 sweep's token
    volume.  20k of the doc texts recur once (id % 180k collisions), so
    exactly 40k docs are fully duplicated: a planted floor for the
    profile.  Structural linearity: the hash-count stage shuffles
    EXACTLY one row per rolling window position (n_docs × (64−K+1) —
    the honest linear cost of substring dedup), never a pair
    explosion."""
    from pyspark_anomaly_detection_spark.text.dedup import (
        DUP_WINDOW_TOKENS,
        _rolling_window_hashes,
        rolling_dup_spans,
    )

    n, distinct, words = 200_000, 180_000, 64
    k = DUP_WINDOW_TOKENS
    planted_docs = 2 * (n - distinct)  # both copies of each recurring text
    docs = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64((F.col("id") % distinct) * 131 + i),
                        F.lit(50_000),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )

    # structural: the shuffled-row count of the blocking stage is the
    # window count, linear in corpus tokens
    n_wins = _rolling_window_hashes(docs, k, "text", "doc_id").count()
    assert n_wins == n * (words - k + 1)

    prof = rolling_dup_spans(docs)
    row = prof.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum("dup_tokens").alias("tot_dup"),
        F.sum((F.col("dup_fraction") == 1.0).cast("long")).alias("n_full"),
    ).collect()[0]
    assert row.n_docs == n
    assert row.tot_tokens == n * words
    # floor: every planted copy is fully covered; ceiling: planted +
    # <1% accidental window collisions across the 50k-word vocabulary
    assert row.n_full >= planted_docs
    assert row.tot_dup >= planted_docs * words
    assert row.tot_dup <= planted_docs * words + 0.01 * n * words, (
        "dup volume super-linear: blocking stage leaking pairs?"
    )


def test_keep_one_election_at_12m_tokens(spark):
    """The q195 owner election at the same 12.8M-token corpus: one
    row_number window over the hash key must mark EXACTLY the planted
    non-owner windows (every window of the 20k recurring copies, since
    each copy's partner owns every hash) plus <1% vocabulary-collision
    noise — the election subsumes the ≥2-count filter with ONE shuffle,
    and stays linear at scale."""
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.text.dedup import (
        DUP_WINDOW_TOKENS,
        _rolling_window_hashes,
    )

    n, distinct, words = 200_000, 180_000, 64
    k = DUP_WINDOW_TOKENS
    wins_per_doc = words - k + 1
    docs = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64((F.col("id") % distinct) * 131 + i),
                        F.lit(50_000),
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    wins = _rolling_window_hashes(docs, k, "text", "doc_id")
    w = Window.partitionBy("wh").orderBy("doc_id", "pos")
    n_non_owner = (
        wins.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") >= 2)
        .count()
    )
    planted = (n - distinct) * wins_per_doc  # the higher copy of each pair
    assert planted <= n_non_owner <= planted + 0.01 * n * wins_per_doc, (
        planted,
        n_non_owner,
    )


def test_connected_components_at_200k_nodes(spark):
    """Dedup clustering at 200k planted pair-edges (doc i ↔ i+200k):
    min-label propagation must converge in O(diameter)=1 effective
    rounds to exactly 200k two-node components — the shape the
    similarity-blocking stack feeds it at corpus scale."""
    from pyspark_anomaly_detection_spark.text.clusters import (
        connected_components,
    )

    n_pairs = 200_000
    edges = spark.range(n_pairs, numPartitions=32).select(
        F.col("id").alias("doc_a"), (F.col("id") + n_pairs).alias("doc_b")
    )
    comp = connected_components(edges, src="doc_a", dst="doc_b")
    agg = comp.groupBy("component").count()
    row = agg.agg(
        F.count("*").alias("n_comp"),
        F.min("count").alias("mn"),
        F.max("count").alias("mx"),
    ).collect()[0]
    assert row.n_comp == n_pairs
    assert row.mn == row.mx == 2
    # labels are the min node id of each pair
    assert comp.filter(F.col("component") >= n_pairs).count() == 0


def test_global_row_ids_at_20m_rows(spark):
    """q185's two-phase global ordinals at 20M rows: the per-partition
    offset map (the only driver-side state, bounded by partition count)
    must compose to an exact 1..N contiguous assignment — checked via
    aggregates, never a driver collect of the ids."""
    from pyspark_anomaly_detection_spark.text.shards import global_row_ids

    n = 20_000_000
    rows = spark.range(n, numPartitions=64).select(
        F.xxhash64("id").alias("k")  # unique, unordered, skew-free keys
    )
    ids = global_row_ids(rows, "k", num_partitions=64)
    row = ids.agg(
        F.count("*").alias("n"),
        F.min("row_id").alias("mn"),
        F.max("row_id").alias("mx"),
        F.countDistinct("row_id").alias("nd"),
    ).collect()[0]
    assert (row.n, row.mn, row.mx, row.nd) == (n, 1, n, n)


def test_grouped_ordinals_skewed_lang_corpus(spark):
    """Round-8 rebase smoke: one language is 90% of a 12.8M-token corpus
    (200k docs x 64 tokens).  The per-group ordinal machinery behind
    q197/q175 must (a) spread the dominant group across MANY tasks (the
    whole point vs a per-lang window sort), (b) keep every task's row
    count near the mean, and (c) still produce exact 1..n_g ordinals per
    group — checked via aggregates, never a driver collect of the ids."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    n = 200_000
    docs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "en")
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 10).cast("string")))
        .alias("lang"),
        F.array_repeat(F.concat(F.lit("tok"), (F.col("id") % 997).cast("string")), 64)
        .alias("toks"),
    ).select(
        "doc_id",
        "lang",
        F.concat_ws(" ", "toks").alias("text"),
    )
    scored = docs.select(
        "doc_id", "lang", F.length("text").alias("v")  # tied values; id breaks
    )
    ranked = grouped_row_ids(
        scored, "lang", ["v", "doc_id"], num_partitions=32
    )
    # (c) exact per-group ordinals, aggregate-only
    per_g = ranked.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.min("grp_rank").alias("mn"),
        F.max("grp_rank").alias("mx"),
        F.countDistinct("grp_rank").alias("nd"),
        F.max("grp_n").alias("gn"),
    ).collect()
    for r in per_g:
        assert (r.mn, r.mx, r.nd, r.gn) == (1, r.n, r.n, r.n), r
    dominant = next(r for r in per_g if r.lang == "en")
    assert dominant.n == 180_000
    # (a)+(b): the dominant group spans many tasks, each near the mean
    parts = (
        ranked.withColumn("p", F.spark_partition_id())
        .groupBy("p", "lang").count().collect()
    )
    en_parts = [r for r in parts if r.lang == "en"]
    assert len(en_parts) >= 16, f"dominant lang in only {len(en_parts)} tasks"
    mean = n / 32
    worst = max(r["count"] for r in parts)
    assert worst <= 3 * mean, f"skewed task holds {worst} rows (mean {mean})"


def test_grouped_running_sum_skewed_source_corpus(spark):
    """Round-9 rebase smoke: the prefix-sum machinery behind the packing
    / curation queries (q93/q100/q181) on a 5M-row corpus where one
    source is 90%.  The dominant group must span many tasks (no
    per-source window sort), and the running sums must be exact —
    checked via the closed form sum(1..n) = n(n+1)/2 on unit values
    and via per-group max == group count, aggregates only."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum

    n = 5_000_000
    rows = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "web")
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 10).cast("string")))
        .alias("source"),
        F.lit(1).alias("n_tokens"),
    )
    summed = grouped_running_sum(
        rows, "source", ["doc_id"], "n_tokens", num_partitions=32
    )
    per_g = summed.groupBy("source").agg(
        F.count("*").alias("n"),
        F.max("run_sum").alias("mx"),
        F.sum("run_sum").alias("tot"),
        F.countDistinct("run_sum").alias("nd"),
    ).collect()
    for r in per_g:
        assert r.mx == r.n, r                     # last prefix = group size
        assert r.nd == r.n, r                     # strictly increasing
        assert r.tot == r.n * (r.n + 1) // 2, r   # sum of 1..n
    dominant = next(r for r in per_g if r.source == "web")
    assert dominant.n == 4_500_000
    parts = (
        summed.withColumn("p", F.spark_partition_id())
        .groupBy("p", "source").count().collect()
    )
    web_parts = [r for r in parts if r.source == "web"]
    assert len(web_parts) >= 16, f"dominant source in {len(web_parts)} tasks"


def test_grouped_lags_skewed_series(spark):
    """Round-9 q102-rebase smoke: lag-3 over a 2M-event corpus where one
    series is 90%.  Exactness via the closed form on consecutive values
    (lag_j of value v is v - j within a series ordered by value), NULLs
    only on each series' first j rows — aggregates only, no collect of
    the data."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_lags

    n = 2_000_000
    rows = spark.range(n, numPartitions=32).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, "load")
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 10).cast("string")))
        .alias("series"),
    )
    lagged = grouped_lags(
        rows, "series", ["event_id"], "event_id", 3, num_partitions=32
    )
    checks = {
        r.series: r
        for r in lagged.groupBy("series")
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("tot"),
            F.sum("lag_1").alias("s1"),
            F.sum("lag_3").alias("s3"),
            F.countDistinct("lag_1").alias("nd1"),
            F.sum(F.when(F.col("lag_1").isNull(), 1).otherwise(0)).alias(
                "null1"
            ),
            F.sum(F.when(F.col("lag_3").isNull(), 1).otherwise(0)).alias(
                "null3"
            ),
        )
        .collect()
    }

    def topk(series: str, k: int) -> list[int]:
        """k largest event ids of a series, from the id-assignment rule."""
        out, i = [], n - 1
        while len(out) < k:
            member = (i % 10 < 9) if series == "load" else (
                series == f"t{i % 10}"
            )
            if member:
                out.append(i)
            i -= 1
        return out

    for series, r in checks.items():
        # lag_j's multiset = the series' ids minus its j largest, so the
        # aggregate identities pin every lag value without collecting data
        assert r.s1 == r.tot - sum(topk(series, 1)), (series, r)
        assert r.s3 == r.tot - sum(topk(series, 3)), (series, r)
        assert r.nd1 == r.n - 1, r            # injective (total order)
        assert (r.null1, r.null3) == (1, 3), r  # exactly the first j rows
    assert checks["load"].n == 1_800_000
