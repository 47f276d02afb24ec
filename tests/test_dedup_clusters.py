"""Dedup clustering invariants beyond the oracle equality check."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.text.clusters import (
    canonical_survivors,
    connected_components,
)
from pyspark_anomaly_detection_spark.text.dedup import minhash_lsh_pairs


def test_components_label_is_min_member(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(
        minhash_lsh_pairs(docs), src="doc_a", dst="doc_b"
    )
    bad = comp.groupBy("component").agg(F.min("node").alias("mn")).filter(
        F.col("component") != F.col("mn")
    )
    assert bad.count() == 0


def test_canonical_survivors_drop_exactly_non_canonical_members(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    kept = canonical_survivors(docs, comp)
    n_docs = docs.count()
    n_dupes = comp.filter(F.col("node") != F.col("component")).count()
    assert kept.count() == n_docs - n_dupes
    # every kept doc that is in a cluster must be its component's canonical
    kept_in_cluster = kept.join(
        comp, kept["doc_id"] == comp["node"]
    ).filter(F.col("node") != F.col("component"))
    assert kept_in_cluster.count() == 0


def test_pagerank_properties(spark):
    """Star + chain graph: mass conservation, positivity, and the hub
    out-ranking leaves — the invariants that don't depend on float
    accumulation order."""
    from pyspark_anomaly_detection_spark.text.clusters import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)],
        ["src", "dst"],
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=15).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4, 5, 10, 11, 12}
    assert abs(sum(ranks.values()) - 9.0) < 1e-6  # mass conserved
    assert all(v > 0.149 for v in ranks.values())
    hub, leaf = ranks[0], ranks[1]
    assert hub > 2 * leaf  # the star hub dominates its leaves
    assert ranks[11] > ranks[10]  # chain middle beats chain end
