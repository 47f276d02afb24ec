"""Reference-LM quality gate: planted in-domain vs out-of-domain
discrimination, exact smoothing arithmetic, OOV accounting, and the
shuffle-join (no cartesian / no Python) plan shape.  The synthetic
corpus shares one vocabulary across lang labels (q223's hash covers the
arithmetic there); these fixtures pin the gate's actual point."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark import plans
from pyspark_anomaly_detection_spark.text.lm import lm_quality_scores


def _docs(spark):
    rows = [
        # the reference slice (lang='en'): 3 docs, shared vocabulary
        (0, "en", "data spark table join query scan data table"),
        (1, "en", "query table data spark join data scan table"),
        (2, "en", "spark data query join table scan spark data"),
        # in-domain candidate: same vocabulary
        (10, "xx", "data table spark query join scan"),
        # out-of-domain candidate: fully OOV
        (11, "yy", "zq wv kj pn mt rs"),
        # mixed: half in-vocabulary, half OOV
        (12, "zz", "data table zq wv"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_in_domain_scores_high_out_of_domain_drops(spark):
    # fixture-scale threshold: the smoothing floor is 1/31 here (tiny
    # vocabulary), far above the production default's 1e-4
    out = {
        r.doc_id: r
        for r in lm_quality_scores(
            _docs(spark), keep_likelihood=0.1
        ).collect()
    }
    # N = 24 reference tokens, V = 6 distinct -> denom = 31
    assert out[10].oov == 0 and out[11].oov == 6 and out[12].oov == 2
    assert out[10].mean_likelihood > 4 * out[11].mean_likelihood
    assert out[10].keep_doc and not out[11].keep_doc
    assert out[11].mean_likelihood == 6 / (6 * 31)  # pure smoothing floor
    # mixed doc sits between
    assert (
        out[11].mean_likelihood
        < out[12].mean_likelihood
        < out[10].mean_likelihood
    )


def test_smoothed_arithmetic_exact(spark):
    """Hand-computed smoothing arithmetic: reference counts data=6,
    spark=4, table=5, join=3, query=3, scan=3 (N=24, V=6, denom=31)."""
    out = {r.doc_id: r for r in lm_quality_scores(_docs(spark)).collect()}
    ref_counts = {"data": 6, "spark": 4, "table": 5, "join": 3,
                  "query": 3, "scan": 3}
    want = sum(ref_counts[t] for t in "data table spark query join scan".split())
    assert out[10].sum_counts == want == 24
    assert out[10].mean_likelihood == (want + 6) / (6 * 31)
    # reference docs score themselves (they're part of the corpus too)
    assert out[0].oov == 0 and out[0].keep_doc


def test_oov_frac_and_totals(spark):
    out = {r.doc_id: r for r in lm_quality_scores(_docs(spark)).collect()}
    assert out[12].n_tokens == 4
    assert out[12].oov_frac == 0.5
    assert out[11].oov_frac == 1.0 and out[11].sum_counts == 0


def test_q223_plan_shape(spark, sf_dir):
    from pyspark_anomaly_detection_spark.registry import all_queries

    df = all_queries()["q223_lm_quality_filter"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert not plans.has_python_eval(df), plan
    assert plans.has_partial_aggregation(df), plan
