"""Benchmark decontamination: planted-overlap exactness, short-doc and
clean-doc edges, and the broadcast-semi-join plan shape (q222's corpus
hash covers the synthetic corpus; these pin the semantics the corpus
doesn't exercise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark import plans
from pyspark_anomaly_detection_spark.text.decontam import (
    benchmark_decontamination,
)

BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _docs(spark):
    rows = [
        # doc_id % 17 == 0 -> benchmark member
        (0, BENCH_SENT),
        # fully contaminated: the benchmark sentence verbatim
        (1, BENCH_SENT),
        # half contaminated: 5 benchmark tokens + 5 novel ones
        (2, "the quick brown fox jumps high above every green hill"),
        # clean: no 5-gram overlap at all
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # too short for any 5-gram
        (4, "tiny doc here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_planted_contamination_exact(spark):
    out = {r.doc_id: r for r in benchmark_decontamination(_docs(spark)).collect()}
    assert sorted(out) == [1, 2, 3, 4]  # doc 0 is the benchmark, not output
    # doc 1: identical 10-token text -> all 6 distinct 5-grams contaminated
    assert (out[1].n_shingles, out[1].n_contaminated) == (6, 6)
    assert out[1].contam_frac == 1.0 and out[1].drop_doc
    # doc 2: shares exactly the first 5-gram ("the quick brown fox jumps")
    assert (out[2].n_shingles, out[2].n_contaminated) == (6, 1)
    assert abs(out[2].contam_frac - 1 / 6) < 1e-12
    assert not out[2].drop_doc  # 1/6 < 0.2
    # doc 3: clean
    assert (out[3].n_contaminated, out[3].drop_doc) == (0, False)
    # doc 4: shorter than n -> zero shingles, frac 0.0, kept
    assert (out[4].n_shingles, out[4].contam_frac, out[4].drop_doc) == (
        0,
        0.0,
        False,
    )


def test_drop_threshold_boundary(spark):
    """frac >= 0.2 drops; construct a doc at exactly 0.2 (1 of 5)."""
    rows = [
        (0, "a b c d e"),                  # benchmark: one 5-gram
        (1, "a b c d e x y z w v"),        # not 6 grams... compute: 10 tokens -> 6 grams; 1 contaminated
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in benchmark_decontamination(docs).collect()}
    assert out[1].n_contaminated == 1 and out[1].n_shingles == 6
    # 1/6 < 0.2 -> kept; now a 9-token doc: 5 grams, 1 hit = exactly 0.2
    docs2 = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e x y z w")], ["doc_id", "text"]
    )
    row = benchmark_decontamination(docs2).filter("doc_id = 1").first()
    assert row.n_shingles == 5 and row.n_contaminated == 1
    assert row.contam_frac == 0.2 and row.drop_doc  # >= is inclusive


def test_plan_broadcasts_benchmark_no_cartesian(spark, sf_dir):
    from pyspark_anomaly_detection_spark.registry import all_queries

    df = all_queries()["q222_benchmark_decontamination"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert plans.uses_broadcast_join(df), plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert not plans.has_python_eval(df), plan
