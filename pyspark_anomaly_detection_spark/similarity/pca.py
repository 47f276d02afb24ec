"""Distributed PCA over the embedding corpus — whitening / dimensionality
reduction as a training-data pipeline operator (index-building, near-dup
quality, and compression all start with "project the embeddings").

Spark-first shape, the classic one-pass moments pattern:

1. **Moments**: one ``mapInPandas`` pass emits per-Arrow-batch partials
   (count, Σx, Σx·xᵀ as a flattened d² array) — numpy matmul per batch,
   no per-row Python.  Partials are ~(#batches) rows of 1 + d + d²
   doubles; at d=64 that is ~4 KB each, so the driver reduce is trivial
   at any corpus size (this is the map-side-combine shape: 100 TB of
   vectors → kilobytes of sufficient statistics).
2. **Eigendecomposition** of the d×d covariance on the driver (numpy
   ``eigh`` — d=64, microseconds; the distributed part is over).
3. **Projection**: broadcast the (mean, components) closure, one more
   ``mapInPandas`` batch-matmul pass.  Never a d×N driver collect.

Float caveat: partial-sum accumulation order depends on partitioning, so
results carry float tolerance, not bitwise stability — the registered
query is rows-only by design (like every float fixpoint here), pinned by
property tests: projected variance per component equals the eigenvalue,
components are orthonormal, eigenvalues match numpy's exact PCA on the
collected corpus at test scale.

Reference parity: the reference has no linear-algebra operators (its ML
surface is the MLlib pipeline, src/models/train.py); this is a
beyond-reference LLM-pipeline operator per the harness brief (embedding
whitening feeds ANN index quality and PQ codebook training).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

N_COMPONENTS = 8


def embedding_moments(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (count, mean[d], covariance[d, d]).

    Covariance is the unbiased sample covariance (n−1 denominator),
    assembled on the driver from per-batch (n, Σx, Σx·xᵀ) partials."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("embedding_moments: empty input")
    d = len(first[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0)],
                    "o": [(x.T @ x).ravel()],
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, o array<double>")
        .collect()
    )
    n = sum(r.n for r in rows)
    if n < 2:
        # the n−1 denominator below would divide by zero and flow
        # silently (inf/nan) into eigh/pca_fit — fail loudly instead,
        # matching the empty-input error above.
        raise ValueError(
            f"embedding_moments: sample covariance needs n >= 2 rows, got {n}"
        )
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    o = np.sum([np.asarray(r.o) for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = (o - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def pca_fit(
    emb: DataFrame, vec_col: str = "embedding", k: int = N_COMPONENTS
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Fit top-k principal components → (mean[d], components[k, d],
    eigenvalues[k], total_variance).  Component sign is canonicalized
    (largest-|coord| entry positive) so the basis is deterministic up to
    float tolerance regardless of LAPACK sign conventions."""
    _, mean, cov = embedding_moments(emb, vec_col)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[order], float(eigvals.sum())


def pca_project(
    emb: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every vector onto the fitted components — one batch-matmul
    ``mapInPandas`` pass with the (k+1)×d closure broadcast by capture."""
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (x - mu) @ w.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": list(proj)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, proj array<double>"
    )


@register("q170_embedding_pca", oracle=None)  # float fixpoint: accumulation
# order is partitioning-specific; invariants pinned in tests/test_pca.py
def q170_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit top-8 principal components of the embedding corpus and verify
    them distributed: per component, the eigenvalue, the explained-
    variance fraction, and the variance of the actual projected corpus
    (which must reproduce the eigenvalue — emitted so the check rides
    every run, not just the test suite)."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, eigvals, total_var = pca_fit(emb)
    proj = pca_project(emb, mean, comps)
    k = comps.shape[0]
    per_comp = proj.select(
        *[F.element_at("proj", i + 1).alias(f"c{i}") for i in range(k)]
    )
    stats = per_comp.agg(
        F.count("*").alias("n"),
        *[F.var_samp(f"c{i}").alias(f"v{i}") for i in range(k)],
    ).collect()[0]
    rows = [
        (
            i,
            float(eigvals[i]),
            float(eigvals[i] / total_var),
            float(stats[f"v{i}"]),
        )
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows,
        "component_id int, eigenvalue double, explained_frac double, "
        "proj_var double",
    )
