"""MLlib LSH estimator invariants: the seeded hash families are not
oracle-replayable, but approxSimilarityJoin verifies candidates with the
TRUE distance — so every returned pair must carry the exact
Jaccard/Euclidean value and be a subset of the exact threshold join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.ml.lsh import (
    mllib_brp_neighbors,
    mllib_minhash_pairs,
)


def _exact_pairs(spark, sf_dir):
    """Exact shingle-Jaccard ≥ 0.5 pairs from the oracle-checked set
    join (q166's engine)."""
    from pyspark_anomaly_detection_spark.text.setjoin import (
        prefix_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_jaccard_pairs(docs).collect()
    }


def test_minhash_pairs_subset_of_exact_with_exact_scores(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in mllib_minhash_pairs(docs).collect()
    }
    exact = _exact_pairs(spark, sf_dir)
    assert got, "MinHashLSH should recover at least one pair"
    # subset of the exact join; each surviving score is the true Jaccard.
    # MLlib computes jaccard over CountVectorizer's vocab-index sets,
    # which is the same set cardinality arithmetic — float tolerance only
    # for the 1-dist subtraction.
    for pair, j in got.items():
        assert pair in exact, f"false positive {pair}"
        assert abs(j - exact[pair]) < 1e-9, (pair, j, exact[pair])
    # recall floor: 8 hash tables at θ=0.5 on near-dup corpora
    assert len(got) / len(exact) >= 0.6, (len(got), len(exact))


def test_brp_neighbors_euclidean_is_exact_and_recall_holds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    got = mllib_brp_neighbors(emb, queries).collect()
    n_queries = queries.count()
    assert len(got) == 5 * n_queries

    # verify a sample of returned distances against hand-computed
    # unit-vector euclidean
    vecs = {
        r.vec_id: r.embedding
        for r in emb.filter(F.col("vec_id") % 4 == 0).collect()
    }

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    checked = 0
    for r in got:
        if r.query_id in vecs and r.cand_id in vecs:
            a, b = unit(vecs[r.query_id]), unit(vecs[r.cand_id])
            d = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
            assert abs(d - r.eucl_dist) < 1e-6
            checked += 1
    assert checked > 10

    # recall vs the exact brute-force cosine top-k (euclidean on unit
    # vectors is cosine-monotone, so the neighbor sets are comparable)
    from pyspark_anomaly_detection_spark.similarity.ann import brute_force_topk

    bf = {
        (r.query_id, r.cand_id)
        for r in brute_force_topk(queries, emb).collect()
    }
    ann = {(r.query_id, r.cand_id) for r in got}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.9, f"inf-radius BRP join must be near-exhaustive: {recall}"
