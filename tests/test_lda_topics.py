"""LDA topic-profile invariants (q219's oracle hash-checks the exact row
censuses + shape verdicts; seeded variational INTERNALS are not
oracle-replayable, so these pin the quantitative contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.ml.clustering import lda_topic_profile

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def profile_and_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return lda_topic_profile(docs, k=5, seed=7).collect(), docs


def test_topic_profile_shape_and_coverage(profile_and_docs, spark):
    rows, docs = profile_and_docs
    assert [r.topic for r in rows] == [0, 1, 2, 3, 4]
    # every document has exactly one dominant topic
    assert sum(r.n_dominant for r in rows) == docs.count()


def test_topic_concentrations_are_probabilities(profile_and_docs):
    rows, _ = profile_and_docs
    for r in rows:
        # summed weight of the top 5 terms of a topic-term distribution
        assert 0.0 < r.top_weight <= 1.0
        assert len(r.top_terms.split(",")) == 5


def test_top_terms_exist_in_corpus(profile_and_docs, spark):
    rows, docs = profile_and_docs
    corpus_terms = {
        r.tok
        for r in docs.select(
            F.explode(F.split("text", r"\s+")).alias("tok")
        )
        .distinct()
        .collect()
    }
    for r in rows:
        for term in r.top_terms.split(","):
            assert term in corpus_terms


def test_doc_topic_mixtures_are_simplex(spark):
    """The transform side: every document's mixture sums to 1 and is
    non-negative — checked at the model level, not the profile."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, SF_DIR, "documents")
    tokens = docs.select("doc_id", F.split("text", r"\s+").alias("toks"))
    cvm = CountVectorizer(
        inputCol="toks", outputCol="tf", vocabSize=2048, minDF=2.0
    ).fit(tokens)
    tf = cvm.transform(tokens).select("doc_id", "tf")
    model = LDA(k=5, seed=7, maxIter=5, featuresCol="tf", optimizer="online").fit(tf)
    stats = (
        model.transform(tf)
        .select(vector_to_array("topicDistribution").alias("theta"))
        .select(
            F.aggregate(
                "theta", F.lit(0.0), lambda a, x: a + x
            ).alias("mass"),
            F.array_min("theta").alias("lo"),
        )
        .agg(
            F.min("mass").alias("min_mass"),
            F.max("mass").alias("max_mass"),
            F.min("lo").alias("min_component"),
        )
        .first()
    )
    assert abs(stats.min_mass - 1.0) < 1e-6
    assert abs(stats.max_mass - 1.0) < 1e-6
    assert stats.min_component >= 0.0
