"""Distributed embedding clustering via the stock MLlib KMeans estimator
— the semantic-grouping operator of the LLM-data toolkit (cluster-then-
sample curation, semantic dedup pre-blocking, topic balancing), built on
``pyspark.ml.clustering.KMeans`` (k-means|| init) over L2-normalized
vectors so squared Euclidean ranks by cosine.

Relation to the rest of the similarity family: IVF ANN (similarity/
ann.py q53) already trains coarse centroids with a hand-rolled Lloyd's
loop for the *index*; this module is the stock-API surface a Spark user
reaches for when the CLUSTERS are the product.  Seeded-random init is
not oracle-replayable → rows-only, pinned by invariants instead
(tests/test_kmeans_clusters.py): every vector assigned, exactly k
clusters, per-cluster mean distance beats the global-centroid baseline
(variance actually explained), and the output is labeled by SIZE RANK,
not by MLlib's arbitrary cluster ids, so the result frame is stable
across runs that find the same partition.

Scale shape: fit is iterative map-reduce over (vector → nearest center)
with centers broadcast per iteration — the canonical 100 TB clustering
plan; transform is one broadcast-map pass.  k·dim doubles live on the
driver, never the data.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import Normalizer
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

N_CLUSTERS = 8


def kmeans_embedding_clusters(
    emb: DataFrame, k: int = N_CLUSTERS, seed: int = 5
) -> DataFrame:
    """embeddings → unit vectors → KMeans(k) → per-cluster profile,
    labeled by size rank (desc, ties by n then avg distance) so the
    output does not depend on MLlib's arbitrary cluster numbering.

    Columns: size_rank, n_vecs, avg_dist (mean Euclidean distance to the
    cluster center on unit vectors), share."""
    prep = Normalizer(inputCol="vec", outputCol="unit", p=2.0).transform(
        emb.select(
            F.col("vec_id").alias("id"), array_to_vector("embedding").alias("vec")
        )
    )
    model = KMeans(
        k=k, seed=seed, featuresCol="unit", predictionCol="cluster"
    ).fit(prep)
    centers = model.clusterCenters()
    spark = emb.sparkSession
    centers_df = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "cluster int, center array<double>",
        )
    )
    assigned = model.transform(prep).join(centers_df, "cluster")
    # JVM-side distance: zip_with + aggregate, no Python in the hot path
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("center"),
                # vector → array for the HOF; unit is an ml VectorUDT
                F.col("unit_arr"),
                lambda c, u: (c - u) * (c - u),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    per_cluster = (
        assigned.withColumn("unit_arr", vector_to_array("unit"))
        .withColumn("dist", dist)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg("dist").alias("avg_dist"),
        )
    )
    total = emb.count()
    w = F.row_number().over(
        Window.orderBy(F.desc("n_vecs"), F.asc("avg_dist"), F.asc("cluster"))
    )
    return (
        per_cluster.withColumn("size_rank", w)
        .select(
            "size_rank",
            "n_vecs",
            "avg_dist",
            (F.col("n_vecs") / F.lit(float(total))).alias("share"),
        )
        .orderBy("size_rank")
    )


@register("q179_kmeans_embedding_clusters", oracle=None)  # seeded k-means||
# init — not oracle-replayable; invariants in tests/test_kmeans_clusters.py
def q179_kmeans_embedding_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic cluster profile of the embeddings table via stock MLlib
    KMeans over unit vectors, size-rank labeled."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_embedding_clusters(emb)
