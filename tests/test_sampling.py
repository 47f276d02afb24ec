"""UDTF and sampling invariants (rows-only registry entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.text.udtf_ops import split_sentences


def test_udtf_sentences_reconstruct_doc_lengths(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sentences = split_sentences(docs)
    # every doc yields at least one sentence; offsets are within the doc
    joined = sentences.join(docs, "doc_id")
    assert joined.filter(
        F.col("start_pos") + F.col("sent_chars") > F.length("text") + 1
    ).count() == 0
    n_docs = docs.filter(F.length(F.trim("text")) > 0).count()
    assert sentences.select("doc_id").distinct().count() == n_docs
    # sentence indices are dense per doc
    per_doc = sentences.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("sent_idx").alias("mx")
    )
    assert per_doc.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    fractions = {"error": 1.0, "click": 0.2, "view": 0.2, "purchase": 0.2, "signup": 0.2}
    s1 = ev.sampleBy("event_type", fractions=fractions, seed=42)
    s2 = ev.sampleBy("event_type", fractions=fractions, seed=42)
    assert sorted(r.event_id for r in s1.collect()) == sorted(
        r.event_id for r in s2.collect()
    ), "same seed + partitioning must reproduce the sample"

    totals = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    kept = {r.event_type: r.n for r in s1.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert kept["error"] == totals["error"], "fraction 1.0 keeps everything"
    for etype, frac in fractions.items():
        if frac < 1.0:
            # Bernoulli sampling: loose 3-sigma band around the expectation
            import math

            n, p = totals[etype], frac
            sigma = math.sqrt(n * p * (1 - p))
            assert abs(kept.get(etype, 0) - n * p) <= 4 * sigma, etype


def test_epoch_shuffle_manifest_properties(spark, sf_dir):
    """q194: every (epoch, doc) appears exactly once; positions are
    contiguous per (epoch, shard); epochs give DIFFERENT orders; the
    whole manifest is partitioning-invariant."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.text.shards import (
        EPOCH_COUNT,
        epoch_shuffle_manifest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    man = epoch_shuffle_manifest(docs).collect()
    assert len(man) == EPOCH_COUNT * n
    per_shard = {}
    for r in man:
        per_shard.setdefault((r.epoch, r.shard), []).append(r.position)
    for key, positions in per_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), key
    order0 = [r.doc_id for r in sorted(
        (r for r in man if r.epoch == 0),
        key=lambda r: (r.shard, r.position))]
    order1 = [r.doc_id for r in sorted(
        (r for r in man if r.epoch == 1),
        key=lambda r: (r.shard, r.position))]
    assert sorted(order0) == sorted(order1)
    assert order0 != order1, "epochs must be distinct permutations"
    again = epoch_shuffle_manifest(docs.repartition(13)).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, again))
