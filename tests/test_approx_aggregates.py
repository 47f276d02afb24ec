"""Sketch-aggregate error bounds vs exact answers (no cross-engine oracle
— HLL/quantile-sketch internals differ per engine, SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.events.rollup import approx_aggregates
from pyspark_anomaly_detection_spark.io.readers import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in approx_aggregates(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for etype, n in exact.items():
        # rsd=0.02 → allow 5 standard deviations plus small-count slack
        assert abs(approx[etype] - n) <= max(3, 0.1 * n), (etype, approx[etype], n)


def test_hll_sketch_union_matches_exact_distinct(spark, sf_dir):
    """Unioning per-day sketches must estimate the global distinct count
    within HLL error (~2% at default lgConfigK; small counts are exact)."""
    from pyspark_anomaly_detection_spark.events.rollup import hll_union_estimates

    ev0 = load_table(spark, sf_dir, "events")
    rows = {r.event_type: r.distinct_users for r in hll_union_estimates(ev0).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact_total = ev.select("user_id").distinct().count()
    assert abs(rows["ALL"] - exact_total) <= max(2, 0.05 * exact_total)
    exact_by_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for etype, n in exact_by_type.items():
        assert abs(rows[etype] - n) <= max(2, 0.05 * n), etype


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    rows = {
        r.event_type: r
        for r in approx_aggregates(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    for etype, row in rows.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).collect()
        )
        lo, hi = vals[0], vals[-1]
        assert lo <= row.p50 <= row.p90 <= row.p99 <= hi
        # p50 must land within the middle half of the distribution
        assert vals[len(vals) // 4] <= row.p50 <= vals[(3 * len(vals)) // 4]


def test_percentile_cont_helper_brackets_range(spark, sf_dir):
    """The native continuous-percentile helper (library-only — its
    interpolation is engine-specific, so no oracle) must return a value
    inside the data range and above the median-by-rank."""
    from pyspark_anomaly_detection_spark.relational.advanced import percentile_cont

    ev = load_table(spark, sf_dir, "events")
    p90 = percentile_cont(ev, "value", 0.9).first().p90
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    med = ev.agg(F.median("value")).first()[0]
    assert lo <= med <= p90 <= hi


def test_sketch_mergeability_union_equals_direct(spark, sf_dir):
    """THE sketch algebra invariant: union-of-partial-sketches must equal
    the sketch built over the unioned raw data.  HLL register merge is a
    deterministic max, so with equal lgConfigK the estimates are EXACTLY
    equal — this is what makes per-day partials answer global questions
    without rescanning raw events."""
    ev = load_table(spark, sf_dir, "events")

    union_of_sketches = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .first()
        .est
    )
    sketch_of_union = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .first()
        .est
    )
    assert union_of_sketches == sketch_of_union, (
        union_of_sketches,
        sketch_of_union,
    )


def test_q99_per_type_matches_direct_sketch(spark, sf_dir):
    """Each q99 per-type estimate (unioned from daily partials) must
    exactly equal a direct single-pass sketch of that type's users."""
    from pyspark_anomaly_detection_spark.events.rollup import hll_union_estimates

    merged = {
        r.event_type: r.distinct_users
        for r in hll_union_estimates(
            load_table(spark, sf_dir, "events")
        ).collect()
        if r.event_type != "ALL"
    }
    direct = {
        r.event_type: r.est
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == direct


def test_quantile_sketch_mergeability(spark, sf_dir):
    """approx_percentile partial merge: percentiles computed over per-day
    groups then over the whole table must bracket each other within the
    sketch's accuracy budget (relative error <= 1/accuracy = 1%)."""
    ev = load_table(spark, sf_dir, "events")
    whole = ev.agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("p")
    ).first().p
    n = ev.count()
    exact = sorted(r.value for r in ev.select("value").collect())
    for q, est in zip([0.5, 0.9, 0.99], whole):
        # rank error <= n/accuracy; translate to a value bracket
        rank = int(q * (n - 1))
        slack = max(2, n // 5_000)
        lo, hi = exact[max(0, rank - slack)], exact[min(n - 1, rank + slack)]
        assert lo <= est <= hi, (q, est, lo, hi)


def test_cms_mergeability_and_guarantee(spark, sf_dir):
    """CMS algebra: counters are additive, so the elementwise sum of
    per-source sketches equals the whole-corpus sketch EXACTLY; and every
    point estimate is >= the true count (the one-sided CMS guarantee)."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.stats import (
        cms_estimate,
        cms_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    whole = cms_sketch(tok).orderBy("row_id", "bucket").toPandas()

    sources = [r.source for r in docs.select("source").distinct().collect()]
    merged = None
    for s in sources:
        part = (
            cms_sketch(tok.filter(F.col("source") == s))
            .toPandas()
            .set_index(["row_id", "bucket"])["cnt"]
        )
        merged = part if merged is None else merged.add(part, fill_value=0)
    merged = merged.astype("int64").reset_index().sort_values(["row_id", "bucket"])
    assert (
        merged.reset_index(drop=True)["cnt"] == whole.reset_index(drop=True)["cnt"]
    ).all(), "union-of-sketches must equal sketch-of-union exactly"

    # one-sided error: estimate >= exact for EVERY token (not just top-20)
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(cms_sketch(tok), exact).toPandas()
    assert (est["cms_estimate"] >= est["exact_cnt"]).all()
