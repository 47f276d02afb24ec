"""KMeans embedding clustering invariants (q179): seeded k-means|| init
is not oracle-replayable, so the operator is pinned by what clustering
must deliver regardless of which local optimum the seed finds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.ml.clustering import (
    N_CLUSTERS,
    kmeans_embedding_clusters,
)


def test_kmeans_cluster_profile_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    rows = kmeans_embedding_clusters(emb).collect()

    # exactly k clusters, labeled 1..k by size rank
    assert [r.size_rank for r in rows] == list(range(1, N_CLUSTERS + 1))
    sizes = [r.n_vecs for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    # every vector assigned exactly once
    assert sum(sizes) == n
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9

    # variance explained: the mean distance to the OWN cluster center
    # must beat the single-global-centroid baseline — otherwise the
    # clustering did nothing.  Baseline computed independently here.
    import numpy as np

    V = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    centroid = U.mean(axis=0)
    baseline = float(np.sqrt(((U - centroid) ** 2).sum(axis=1)).mean())
    weighted_avg = sum(r.n_vecs * r.avg_dist for r in rows) / n
    assert weighted_avg < baseline, (weighted_avg, baseline)
    # distances are unit-sphere bounded
    for r in rows:
        assert 0.0 <= r.avg_dist <= 2.0 + 1e-9
        assert math.isfinite(r.avg_dist)


def test_kmeans_deterministic_with_seed(spark, sf_dir):
    """Same seed + same data ⇒ identical profile (MLlib k-means|| is
    seed-deterministic for a fixed input)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_embedding_clusters(emb).collect()
    b = kmeans_embedding_clusters(emb).collect()
    assert [(r.size_rank, r.n_vecs, round(r.avg_dist, 9)) for r in a] == [
        (r.size_rank, r.n_vecs, round(r.avg_dist, 9)) for r in b
    ]


def test_kmeans_registry_query_runs(spark, sf_dir):
    """q179 is the audit view since its r11 oracle promotion: one row,
    exact assigned-vector census + shape verdicts all TRUE."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.registry import all_queries

    row = all_queries()["q179_kmeans_embedding_clusters"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_vectors == load_table(spark, sf_dir, "embeddings").count()
    assert r.k_clusters == N_CLUSTERS
    assert r.shares_sum_to_one and r.dists_on_unit_sphere and r.size_rank_ordered
