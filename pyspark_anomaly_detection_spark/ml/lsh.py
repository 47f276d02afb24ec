"""MLlib LSH estimators as dedup/ANN operators — the SURVEY §2.10
north-star surface built on ``pyspark.ml.feature`` directly
(MinHashLSH / BucketedRandomProjectionLSH), complementing the
hand-rolled md5-based MinHash (text/dedup.py) and sign-LSH
(similarity/ann.py) pipelines.

Why both exist: the custom pipelines use a portable hash family so the
DuckDB oracle can replay them bit-for-bit; the MLlib estimators are the
stock API a Spark user reaches for first, with seeded-random hash
families the oracle cannot reproduce — so these queries are rows-only,
pinned instead by EXACTNESS invariants: ``approxSimilarityJoin``
computes the TRUE distance on every surviving candidate pair, so each
returned Jaccard/Euclidean distance must agree with the exact
computation, and the returned pair set must be a subset of the exact
threshold join (tests/test_mllib_lsh.py).

Scale shape (both estimators): fit is a seed draw (no data pass),
transform adds a hash-signature column, and the join explodes on
(hash-band, bucket) — the same banded equi-join the custom pipeline
plans, so the 100 TB story is unchanged: signatures shuffle, text and
vectors do not.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
    NGram,
    Normalizer,
    RegexTokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Jaccard-distance ceiling for the MinHash similarity join: distance
#: ≤ 0.5 ⇔ Jaccard ≥ 0.5 — the same threshold as q166's exact set join.
MINHASH_DIST = 0.5

BRP_BUCKET_LEN = 2.0
BRP_TABLES = 4


def mllib_minhash_pairs(
    docs: DataFrame, threshold: float = MINHASH_DIST, seed: int = 7
) -> DataFrame:
    """Shingle sets → binary CountVectorizer space → MinHashLSH
    ``approxSimilarityJoin`` → (doc_a, doc_b, jaccard) with doc_a < doc_b.

    The returned ``jaccard`` is exact (MLlib verifies candidates with the
    true distance), so downstream consumers can re-threshold without
    rerunning the join."""
    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=" ", minTokenLength=1
    )
    ngram = NGram(n=3, inputCol="toks", outputCol="shingles")
    # shingled feeds BOTH the CountVectorizer fit and the transform —
    # persist so tokenize+ngram runs once (measured 5.1 → 4.0 s at sf0.1).
    shingled = (
        ngram.transform(tok.transform(docs))
        .filter(F.size("shingles") > 0)
        .persist()
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(shingled)
    feats = cv.transform(shingled).select("doc_id", "features")
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=seed
    ).fit(feats)
    joined = mh.approxSimilarityJoin(feats, feats, threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.lit(1.0) - F.col("dist")).alias("jaccard"),
        )
    )


@register("q171_mllib_minhash_pairs", oracle=None)  # seeded MLlib hash
# family — not oracle-replayable; exactness/containment pinned in
# tests/test_mllib_lsh.py
def q171_mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via the stock MLlib MinHashLSH estimator at the
    q166 threshold — the API-parity twin of the portable-hash pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    return mllib_minhash_pairs(docs).orderBy("doc_a", "doc_b")


def mllib_brp_neighbors(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    seed: int = 11,
) -> DataFrame:
    """Cosine-flavored ANN via BucketedRandomProjectionLSH: vectors are
    L2-normalized first, so Euclidean distance is monotone in cosine
    (d² = 2 − 2·cos) and the estimator's Euclidean buckets rank by
    cosine.  Returns (query_id, cand_id, eucl_dist) — k rows per query
    via ``approxNearestNeighbors`` per partition-collected query is a
    driver loop, so this uses the set-join form + per-query top-k window
    (one distributed job)."""
    from pyspark.sql.window import Window

    norm = Normalizer(inputCol="vec", outputCol="unit", p=2.0)
    prep = lambda df, idc: norm.transform(  # noqa: E731
        df.select(F.col(idc).alias("id"), array_to_vector("embedding").alias("vec"))
    ).select("id", "unit")
    cands = prep(emb, "vec_id")
    qs = prep(queries, "vec_id")
    brp = BucketedRandomProjectionLSH(
        inputCol="unit",
        outputCol="hashes",
        bucketLength=BRP_BUCKET_LEN,
        numHashTables=BRP_TABLES,
        seed=seed,
    ).fit(cands)
    joined = brp.approxSimilarityJoin(qs, cands, float("inf"), distCol="dist")
    w = Window.partitionBy("query_id").orderBy("eucl_dist", "cand_id")
    return (
        joined.select(
            F.col("datasetA.id").alias("query_id"),
            F.col("datasetB.id").alias("cand_id"),
            F.col("dist").alias("eucl_dist"),
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


@register("q172_mllib_brp_ann", oracle=None)  # seeded MLlib projections —
# not oracle-replayable; recall vs brute force pinned in tests
def q172_mllib_brp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors per sampled query via the stock MLlib
    BucketedRandomProjectionLSH estimator over unit vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    return mllib_brp_neighbors(emb, queries).orderBy("query_id", "eucl_dist")
