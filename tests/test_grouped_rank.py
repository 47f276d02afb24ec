"""Round 8: scalable per-group ordinals (text/shards.py::grouped_row_ids)
and the q175/q197 rebase onto them — equivalence to the window forms,
the lone-doc quantile guard, and plan shape (range-partitioned sort, no
per-group Window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark import plans
from pyspark_anomaly_detection_spark.text.shards import (
    grouped_ntile,
    grouped_percent_rank,
    grouped_row_ids,
)


def _skewed_df(spark, n_a=900, n_b=90, n_c=9, n_d=1):
    """Heavily skewed groups with shuffled insert order and tied values."""
    rows = []
    for g, n in (("aa", n_a), ("bb", n_b), ("cc", n_c), ("dd", n_d)):
        for i in range(n):
            rows.append((g, (i * 7919) % 100, g + str(i)))  # ties in v
    rows = rows[::3] + rows[1::3] + rows[2::3]  # de-cluster groups
    return spark.createDataFrame(rows, ["g", "v", "id"])


def test_grouped_row_ids_match_window_row_number(spark, force_scalable_grouped):
    df = _skewed_df(spark)
    got = {
        (r.g, r.id): (r.grp_rank, r.grp_n)
        for r in grouped_row_ids(df, "g", ["v", "id"], num_partitions=16)
        .collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    cnt = Window.partitionBy("g")
    want = {
        (r.g, r.id): (r.rk, r.n)
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(cnt))
        .collect()
    }
    assert got == want


def test_grouped_percent_rank_matches_window(spark, force_scalable_grouped):
    df = _skewed_df(spark)
    got = {
        r.id: r.pr
        for r in grouped_percent_rank(df, "g", ["v", "id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r.id: r.pr
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    # bitwise: both are (rank-1)/(n-1) integer-derived IEEE divisions
    assert got == want


@pytest.mark.parametrize("k", [1, 3, 7, 10, 64])
def test_grouped_ntile_matches_window(spark, k, force_scalable_grouped):
    """Closed-form NTILE == Spark's NTILE for group sizes above, below,
    and equal to k (dd has a single row; cc has 9 < most k)."""
    df = _skewed_df(spark)
    got = {
        r.id: r.tile
        for r in grouped_ntile(df, "g", ["v", "id"], k).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r.id: r.t for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_lang_quantile_gate_lone_doc_always_kept(spark):
    """ADVICE r7: a language with ONE document has percent_rank 0.0 and
    must still pass the gate — a lone doc in a rare language is not
    evidence of low quality."""
    from pyspark_anomaly_detection_spark.text.stats import lang_quantile_gate

    rows = [(i, "aa", " ".join(f"w{j % (i + 1)}" for j in range(10)))
            for i in range(10)]
    rows.append((99, "zz", "a a a a a a a a a a"))  # lone, diversity 0.1
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r.doc_id: r for r in lang_quantile_gate(docs).collect()}
    assert out[99].pr == 0.0
    assert out[99].keep is True
    # multi-doc group still drops its bottom quintile
    assert not out[min(
        (r.doc_id for r in out.values() if r.lang == "aa"),
        key=lambda d: (out[d].lexical_diversity, d),
    )].keep


def test_q197_q175_plans_have_no_pergroup_window(spark, sf_dir, force_scalable_grouped):
    """The rebase's point: NO Window operator (no single post-shuffle
    partition per lang/source); the sort stage is range-partitioned on
    (group, order cols) so a dominant group spans many tasks."""
    from pyspark_anomaly_detection_spark.registry import all_queries

    qs = all_queries()
    for name, grp, ordc in [
        ("q197_lang_quality_quantile_gate", "lang", "lexical_diversity"),
        ("q175_curriculum_deciles", "source", "difficulty"),
    ]:
        df = qs[name].fn(spark, sf_dir)
        plan = plans.formatted_plan(df)
        assert "Window" not in plan, (name, plan)
        lower = plan.lower()
        assert "rangepartitioning" in lower, (name, plan)
        # the range key must include BOTH group and order col — partition
        # boundaries split groups, the scalable property
        import re

        rp = re.findall(r"rangepartitioning\(([^)]*)\)", lower)
        assert any(grp in frag and ordc in frag for frag in rp), (name, rp)


def test_grouped_row_ids_rejects_non_string_group(spark):
    """The broadcast offset map is keyed by Spark's STRING rendering of
    the group; for bool/float/timestamp groups Python's repr differs
    (True vs 'true') and lookups would silently yield NULL ranks — so a
    non-string group column must raise, not misbehave."""
    import pytest

    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    df = spark.createDataFrame([(True, 1), (False, 2)], "flag boolean, id long")
    with pytest.raises(TypeError, match="string group column"):
        grouped_row_ids(df, "flag", ["id"])


def test_grouped_running_sum_matches_window_cumsum(spark, force_scalable_grouped):
    """Bitwise equality of grouped_running_sum with the single-exchange
    window form on skewed groups, ascending and descending orderings."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum

    df = _skewed_df(spark).withColumn("val", (F.length("id") * 3 + F.col("v")))
    for order in (
        ["v", "id"],
        [F.desc("v"), F.asc("id")],
    ):
        got = {
            r.id: r.run_sum
            for r in grouped_running_sum(
                df, "g", order, "val", num_partitions=16
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r.id: r.cs
            for r in df.withColumn(
                "cs", F.sum(F.col("val").cast("long")).over(w)
            ).collect()
        }
        assert got == want, f"order={order}"


def test_grouped_running_sum_rejects_non_string_group(spark):
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum

    df = spark.createDataFrame([(1, 2)], "g long, v long")
    with pytest.raises(TypeError, match="string group column"):
        grouped_running_sum(df, "g", ["v"], "v")


def test_rebased_r9_queries_have_no_fewgroup_window(spark, sf_dir, force_scalable_grouped):
    """The r9 rebase's point: the packing / percentile / rank queries no
    longer contain a Window partitioned ONLY by their few-value group key
    over raw-table input.  (grouped_running_sum's internal window is
    partitioned by (pid, group) — per range partition, which is the
    scalable shape; grouped_row_ids has no Window at all.)"""
    import re

    from pyspark_anomaly_detection_spark.registry import all_queries

    qs = all_queries()
    few_keys = {
        "q93_sequence_packing": "source",
        "q100_training_pipeline": "split",
        "q181_quality_budget_selection": "source",
        "q137_training_mix": "source",
        "q43_percentiles_exact": "l_returnflag",
        "q151_winsorized_stats": "l_returnflag",
        "q104_iqr_outliers": "event_type",
        "q102_decay_smoother": "event_type",
        "q81_relative_rank": "o_orderpriority",
        "q148_top_quarter_supplier": None,  # empty-frame window gone entirely
    }
    for name, key in few_keys.items():
        plan = plans.formatted_plan(qs[name].fn(spark, sf_dir))
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan.lower()):
            if key is None:
                raise AssertionError(f"{name}: unexpected window: {spec}")
            if "_pid" in spec:
                continue  # grouped_running_sum's per-partition window
            if key in spec:
                raise AssertionError(
                    f"{name}: few-group window survived the rebase: {spec}"
                )
            # other windows (e.g. q100's _digest dedup) partition on
            # high-cardinality keys — audited safe in COVERAGE.md


def test_grouped_lags_match_window_lag(spark, force_scalable_grouped):
    """grouped_lags == LAG(value, j) OVER (PARTITION BY g ORDER BY v, id)
    for j = 1..3 on skewed groups, including NULLs for the first-j rows
    of each group."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_lags

    df = _skewed_df(spark).withColumn("val", (F.length("id") * 3 + F.col("v")))
    got = {
        r.id: (r.lag_1, r.lag_2, r.lag_3)
        for r in grouped_lags(
            df, "g", ["v", "id"], "val", 3, num_partitions=16
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r.id: (r.l1, r.l2, r.l3)
        for r in df.withColumn("l1", F.lag("val", 1).over(w))
        .withColumn("l2", F.lag("val", 2).over(w))
        .withColumn("l3", F.lag("val", 3).over(w))
        .collect()
    }
    assert got == want


# ---------------- round 10: size-adaptive dispatch (the q100 gate fix)


def test_small_input_dispatches_to_plain_window(spark):
    """Below the plan-size threshold the machinery must emit the plain
    single-exchange window — no _pid column, no range exchange, no
    offset-collect job — recovering the ~3× fixture-scale latency the
    round-9 rebase cost q100."""
    from pyspark_anomaly_detection_spark.text.shards import (
        SMALL_PLAN_BYTES_CONF,
        SMALL_PLAN_BYTES_DEFAULT,
        grouped_row_ids,
        grouped_running_sum,
    )

    spark.conf.set(SMALL_PLAN_BYTES_CONF, str(SMALL_PLAN_BYTES_DEFAULT))
    try:
        # range-rooted: Catalyst knows its true (tiny) size.  A
        # createDataFrame LogicalRDD has UNKNOWN stats -> huge default
        # -> scalable path, the conservative direction (tested below).
        df = spark.range(1000).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") * 7919 % 100).alias("v"),
            F.col("id").cast("string").alias("id"),
            (F.col("id") % 100 + 1).alias("val"),
        )
        for out in (
            grouped_running_sum(df, "g", ["v", "id"], "val"),
            grouped_row_ids(df, "g", ["v", "id"]),
        ):
            plan = plans.formatted_plan(out)
            assert "_pid" not in plan, plan
            assert "rangepartitioning" not in plan.lower(), plan
            assert "Window" in plan, plan
    finally:
        spark.conf.unset(SMALL_PLAN_BYTES_CONF)


def test_adaptive_paths_agree(spark):
    """Both dispatch arms produce identical (bitwise) results on the
    skewed fixture — ranks, totals, and integral running sums."""
    from pyspark_anomaly_detection_spark.text.shards import (
        SMALL_PLAN_BYTES_CONF,
        grouped_row_ids,
        grouped_running_sum,
    )

    df = _skewed_df(spark).withColumn("val", F.col("v") * 3 + 1)
    results = {}
    # the skewed fixture is a LogicalRDD (unknown stats -> ~2^63
    # default estimate), so the small arm needs a limit above that
    for mode, limit in (("small", str(1 << 70)), ("scalable", "0")):
        spark.conf.set(SMALL_PLAN_BYTES_CONF, limit)
        try:
            results[mode] = (
                {
                    (r.g, r.id): (r.grp_rank, r.grp_n)
                    for r in grouped_row_ids(df, "g", ["v", "id"]).collect()
                },
                {
                    r.id: r.run_sum
                    for r in grouped_running_sum(
                        df, "g", ["v", "id"], "val"
                    ).collect()
                },
            )
        finally:
            spark.conf.unset(SMALL_PLAN_BYTES_CONF)
    assert results["small"] == results["scalable"]


def test_scalable_path_engages_above_threshold(spark):
    """A frame whose Catalyst estimate exceeds the threshold must take
    the range-exchange path even with the default conf — the 100 TB
    safety direction of the dispatch."""
    from pyspark_anomaly_detection_spark.text.shards import (
        grouped_running_sum,
    )

    big = spark.range(3_000_000, numPartitions=8).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.lit(1).alias("val"),
    )
    out = grouped_running_sum(big, "g", ["id"], "val")
    plan = plans.formatted_plan(out)
    assert "_pid" in plan or "rangepartitioning" in plan.lower(), plan
