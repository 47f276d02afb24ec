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
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    # JVM local relation, not a Python-RDD scan (r17: the tuple-form
    # createDataFrame pays a Python worker round trip per action)
    centers_df = F.broadcast(
        local_rows_df(
            spark,
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


@register(
    "q179_kmeans_embedding_clusters",
    # promoted round 11 from rows-only: seeded k-means|| init is not
    # oracle-replayable, but the clustering's CONTRACT is — the assigned-
    # vector census is hash-checked cross-engine (Σ cluster sizes must
    # equal COUNT(*) exactly: no vector dropped or double-assigned), and
    # the profile-shape invariants (k populated clusters, shares summing
    # to 1, unit-sphere distances on [0,2], size-rank ordering) are
    # verdicts DuckDB asserts TRUE.  Raw per-cluster profile remains
    # available via kmeans_embedding_clusters; variance-explained floors
    # stay pinned in tests/test_kmeans_clusters.py.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(8 AS BIGINT) AS k_clusters,
           TRUE AS shares_sum_to_one,
           TRUE AS dists_on_unit_sphere,
           TRUE AS size_rank_ordered
    FROM embeddings
    """,
)
def q179_kmeans_embedding_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contract audit of the MLlib KMeans cluster profile: exact
    assigned-vector census plus profile-shape verdicts."""
    from pyspark_anomaly_detection_spark.plans import audit_row

    emb = load_table(spark, sf_dir, "embeddings")
    profile = kmeans_embedding_clusters(emb).collect()  # k rows
    sizes = [int(r.n_vecs) for r in profile]
    return audit_row(
        spark,
        n_vectors=sum(sizes),
        k_clusters=len(profile),
        shares_sum_to_one=bool(abs(sum(r.share for r in profile) - 1.0) <= 1e-9),
        dists_on_unit_sphere=bool(
            all(0.0 <= r.avg_dist <= 2.0 for r in profile)
        ),
        size_rank_ordered=bool(
            [r.size_rank for r in profile] == list(range(1, len(profile) + 1))
            and all(
                profile[i].n_vecs >= profile[i + 1].n_vecs
                for i in range(len(profile) - 1)
            )
        ),
    )


# --------------------------------------------------------------------------
# LDA topic modeling — the corpus-structure estimator of the LLM-data
# toolkit (domain discovery for mixture weighting, topic-balanced
# sampling).  Stock pyspark.ml.clustering.LDA over CountVectorizer term
# counts; the online optimizer is the scale path (mini-batch variational
# Bayes — one pass over partitions per iteration, no corpus-sized state
# on the driver; topic-term matrix is k x vocab on the driver, data-size
# independent).
# --------------------------------------------------------------------------


def lda_topic_profile(
    docs: DataFrame,
    k: int = 5,
    seed: int = 7,
    vocab_size: int = 2048,
    max_iter: int = 5,
    top_terms: int = 5,
) -> DataFrame:
    """documents → term counts → LDA(k) → per-topic profile.

    Columns: topic, top_terms (comma-joined vocabulary words, weight
    descending), top_weight (summed weight of those terms — topic
    concentration), n_dominant (docs whose argmax mixture component is
    this topic), labeled by MLlib's topic index under a fixed seed.
    Seeded variational init is not oracle-replayable → rows-only;
    invariants (simplex-normalized mixtures, positive descending term
    weights, full doc coverage) are pinned in tests/test_lda_topics.py."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    tokens = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("toks")
    )  # NULL text has no terms; CountVectorizer rejects null arrays
    cvm = CountVectorizer(
        inputCol="toks", outputCol="tf", vocabSize=vocab_size, minDF=2.0
    ).fit(tokens)
    tf = cvm.transform(tokens).select("doc_id", "tf")
    model = LDA(
        k=k,
        seed=seed,
        maxIter=max_iter,
        featuresCol="tf",
        optimizer="online",
    ).fit(tf)

    vocab = cvm.vocabulary
    spark = docs.sparkSession
    topics = model.describeTopics(top_terms)

    # doc-topic mixtures: argmax component per doc (one broadcast-map
    # pass; the k-vector per row never leaves the executor)
    mix = model.transform(tf).select(
        "doc_id", vector_to_array("topicDistribution").alias("theta")
    )
    dominant = (
        mix.select(
            "doc_id",
            F.array_position(
                F.col("theta"), F.array_max("theta")
            ).alias("pos1"),
        )
        .select((F.col("pos1") - 1).cast("int").alias("topic"))
        .groupBy("topic")
        .agg(F.count("*").alias("n_dominant"))
    )

    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    vocab_df = F.broadcast(
        local_rows_df(
            spark, [(i, w) for i, w in enumerate(vocab)], "idx int, term string"
        )
    )
    named = (
        topics.select(
            "topic",
            F.posexplode(
                F.arrays_zip("termIndices", "termWeights")
            ).alias("pos", "tw"),
        )
        .select(
            "topic",
            "pos",
            F.col("tw.termIndices").alias("idx"),
            F.col("tw.termWeights").alias("w"),
        )
        .join(vocab_df, "idx")
        .groupBy("topic")
        .agg(
            F.concat_ws(
                ",", F.array_sort(
                    F.collect_list(F.struct("pos", "term"))
                ).term
            ).alias("top_terms"),
            F.sum("w").cast("double").alias("top_weight"),
        )
    )
    return (
        named.join(dominant, "topic", "left")
        .select(
            F.col("topic").cast("int").alias("topic"),
            "top_terms",
            "top_weight",
            F.coalesce("n_dominant", F.lit(0)).cast("long").alias("n_dominant"),
        )
        .orderBy("topic")
    )


@register(
    "q219_lda_topics",
    # promoted round 11 from rows-only: the seeded variational fit is not
    # oracle-replayable, but the topic model's CONTRACT is — every doc has
    # exactly one dominant topic, so Σ n_dominant must equal COUNT(*) of
    # documents exactly (hash-checked cross-engine: no doc dropped by the
    # CountVectorizer/transform path), the model must emit exactly k=5
    # topics, and the profile invariants (positive sub-unit concentration,
    # non-empty top terms) are verdicts DuckDB asserts TRUE.  Raw topic
    # profile remains available via lda_topic_profile; simplex/weight
    # ordering stays pinned in tests/test_lda_topics.py.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_covered,
           CAST(5 AS BIGINT) AS n_topics,
           TRUE AS concentrations_valid,
           TRUE AS top_terms_nonempty
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q219_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract audit of the MLlib LDA topic profile: exact dominant-doc
    census plus profile-shape verdicts."""
    from pyspark_anomaly_detection_spark.plans import audit_row

    docs = load_table(spark, sf_dir, "documents")
    profile = lda_topic_profile(docs).collect()  # k rows
    return audit_row(
        spark,
        n_docs_covered=sum(int(r.n_dominant) for r in profile),
        n_topics=len(profile),
        concentrations_valid=bool(
            all(0.0 < r.top_weight < 1.0 for r in profile)
        ),
        top_terms_nonempty=bool(all(r.top_terms for r in profile)),
    )
