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
