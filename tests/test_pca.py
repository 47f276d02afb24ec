"""Distributed PCA invariants: the one-pass moments must equal numpy's
exact computation at test scale, the fitted basis must be orthonormal
with descending eigenvalues, and projecting the corpus must reproduce
each eigenvalue as the per-component variance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.similarity.pca import (
    N_COMPONENTS,
    embedding_moments,
    pca_fit,
    pca_project,
)


def _collected(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    return emb, x


def test_moments_match_numpy(spark, sf_dir):
    emb, x = _collected(spark, sf_dir)
    n, mean, cov = embedding_moments(emb)
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        cov, np.cov(x, rowvar=False), rtol=1e-9, atol=1e-12
    )


def test_pca_basis_orthonormal_and_matches_numpy(spark, sf_dir):
    emb, x = _collected(spark, sf_dir)
    mean, comps, eigvals, total_var = pca_fit(emb)

    # orthonormal basis, descending spectrum
    np.testing.assert_allclose(
        comps @ comps.T, np.eye(comps.shape[0]), atol=1e-10
    )
    assert (np.diff(eigvals) <= 1e-12).all()
    assert 0 < eigvals.sum() <= total_var * (1 + 1e-12)

    # spectrum matches numpy's exact PCA on the collected corpus
    ref = np.linalg.eigvalsh(np.cov(x, rowvar=False))[::-1][: len(eigvals)]
    np.testing.assert_allclose(eigvals, ref, rtol=1e-8)


def test_projection_variance_reproduces_eigenvalues(spark, sf_dir):
    emb, _ = _collected(spark, sf_dir)
    mean, comps, eigvals, _ = pca_fit(emb)
    proj = pca_project(emb, mean, comps)
    row = proj.select(
        *[
            F.var_samp(F.element_at("proj", i + 1)).alias(f"v{i}")
            for i in range(len(eigvals))
        ],
        *[
            F.avg(F.element_at("proj", i + 1)).alias(f"m{i}")
            for i in range(len(eigvals))
        ],
    ).collect()[0]
    for i, ev in enumerate(eigvals):
        assert abs(row[f"v{i}"] - ev) <= 1e-8 * max(1.0, ev)
        assert abs(row[f"m{i}"]) <= 1e-9  # centered projection


def test_pca_stable_under_repartition(spark, sf_dir):
    """Same spectrum and (sign-canonicalized) basis regardless of input
    partitioning — float tolerance, not bitwise (accumulation order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, c1, e1, _ = pca_fit(emb)
    _, c2, e2, _ = pca_fit(emb.repartition(13))
    np.testing.assert_allclose(e1, e2, rtol=1e-9)
    np.testing.assert_allclose(c1, c2, atol=1e-7)


def test_q170_registry_row_shape(spark, sf_dir):
    """q170 is the audit view since its r11 oracle promotion: one row,
    exact projected-row census + spectral verdicts all TRUE (the raw
    per-component eigenvalue/projection-variance equality is pinned by
    test_projection_variance_reproduces_eigenvalues above)."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.registry import all_queries

    out = all_queries()["q170_embedding_pca"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_vectors == load_table(spark, sf_dir, "embeddings").count()
    assert r.k_components == N_COMPONENTS
    assert r.eigvals_descending
    assert r.proj_var_matches_eigvals
    assert r.explained_fracs_valid
