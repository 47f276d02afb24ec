"""Approximate-similarity guarantees that the DuckDB oracle can't express:
set-containment and recall against the exact brute force (SURVEY.md §7.4 —
LSH correctness is recall, not hash equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.similarity.ann import brute_force_topk, lsh_topk
from pyspark_anomaly_detection_spark.similarity.neardup import (
    cosine_neardup_pairs,
    ivf_topk,
    lsh_blocked_neardup,
)


def test_blocked_neardup_is_subset_of_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.a_id, r.b_id) for r in cosine_neardup_pairs(emb).collect()}
    blocked = {(r.a_id, r.b_id) for r in lsh_blocked_neardup(emb).collect()}
    assert blocked, "blocking must keep at least some candidate pairs"
    assert blocked <= exact, "blocked pairs must pass the same exact threshold"


def test_neardup_pairs_are_canonical_ordered(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(emb)
    assert pairs.filter(F.col("a_id") >= F.col("b_id")).count() == 0


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    bf = {(r.query_id, r.cand_id) for r in brute_force_topk(queries, emb).collect()}
    ivf = {(r.query_id, r.cand_id) for r in ivf_topk(emb, queries).collect()}
    n_queries = queries.count()
    assert len(ivf) == 5 * n_queries, "every query must return exactly k rows"
    recall = len(bf & ivf) / len(bf)
    # Structureless near-orthogonal vectors: nprobe=4/16 measures 0.62.
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.3f}"


def test_lsh_topk_scores_match_brute_force_on_overlap(spark, sf_dir):
    """Where LSH and brute force agree on a (query, cand) pair, the cosine
    must be identical — the approximation is in candidate pruning only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    bf = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in brute_force_topk(queries, emb).collect()
    }
    approx = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in lsh_topk(emb).filter(F.col("query_id") % 20 == 0).collect()
    }
    overlap = set(bf) & set(approx)
    assert overlap, "LSH should recover at least one true top-k pair"
    for key in overlap:
        assert bf[key] == approx[key]


def test_vectorized_topk_matches_exact_fold(spark, sf_dir):
    """The BLAS path must return the same neighbor sets as the exact fold
    (allowing last-ulp rank flips on near-ties: ≥95% pair overlap and
    identical per-query counts)."""
    from pyspark_anomaly_detection_spark.similarity.ann import (
        q37_ann_cosine_topk,
        q116_ann_topk_vectorized,
    )

    exact = {
        (r.query_id, r.cand_id) for r in q37_ann_cosine_topk(spark, sf_dir).collect()
    }
    fast = {
        (r.query_id, r.cand_id)
        for r in q116_ann_topk_vectorized(spark, sf_dir).collect()
    }
    assert len(fast) == len(exact)
    overlap = len(exact & fast) / len(exact)
    assert overlap >= 0.95, f"vectorized top-k diverged: {overlap:.3f}"


def test_exact_neardup_refuses_large_input(spark):
    """The N² all-pairs form must be unreachable on production-size input:
    the guard refuses above MAX_EXACT_ROWS unless explicitly overridden."""
    import pytest

    from pyspark_anomaly_detection_spark.similarity.neardup import MAX_EXACT_ROWS

    big = spark.range(MAX_EXACT_ROWS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="all-pairs refused"):
        cosine_neardup_pairs(big)
    # explicit override still works (for tests that knowingly pay N²)
    assert cosine_neardup_pairs(big.limit(5), max_exact_rows=None).count() >= 0


def test_adaptive_neardup_dispatch(spark, sf_dir):
    """adaptive_neardup_pairs: exact plan (and exact results) at oracle
    scale, LSH-blocked plan above the threshold — blocked output must be a
    threshold-respecting subset of exact."""
    from pyspark_anomaly_detection_spark.similarity.neardup import (
        adaptive_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.a_id, r.b_id) for r in cosine_neardup_pairs(emb).collect()}
    small = {(r.a_id, r.b_id) for r in adaptive_neardup_pairs(emb).collect()}
    assert small == exact  # ≤ MAX_EXACT_ROWS → identical to brute force

    forced = adaptive_neardup_pairs(emb, max_exact_rows=10)  # force blocked path
    blocked = {(r.a_id, r.b_id) for r in forced.collect()}
    assert blocked <= exact and blocked


def test_ngram_jaccard_refuses_unsampled_input(spark):
    import pytest

    from pyspark_anomaly_detection_spark.text.dedup import ngram_jaccard_pairs

    cap = ngram_jaccard_pairs.__defaults__[0]  # refusal cap (10k as of r16)
    big = spark.range(cap + 1).select(
        F.col("id").alias("doc_id"), F.lit("some words here repeated").alias("text")
    )
    with pytest.raises(ValueError, match="Jaccard all-pairs refused"):
        ngram_jaccard_pairs(big)


def test_pq_ann_recall_and_determinism(spark, sf_dir):
    """PQ ADC shortlist + exact re-rank: recall@5 vs the exact fold stays
    high (the shortlist is the only approximation — re-ranked order is
    exact), and the seeded codebook makes reruns bitwise-identical.
    (r11: the REGISTERED q140 is now the oracle-checked audit view, so
    the raw pair listing under test comes from the operator itself.)"""
    from pyspark_anomaly_detection_spark.registry import all_queries
    from pyspark_anomaly_detection_spark.similarity.ann import pq_ann_topk

    reg = all_queries()
    exact = reg["q37_ann_cosine_topk"].fn(spark, sf_dir).toPandas()
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    pq = pq_ann_topk(queries, emb).orderBy("query_id", "rk").toPandas()
    e = exact.groupby("query_id")["cand_id"].apply(set)
    p = pq.groupby("query_id")["cand_id"].apply(set)
    recalls = [len(e[q] & p[q]) / len(e[q]) for q in e.index]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.75, f"PQ mean recall@5 collapsed: {mean_recall:.3f}"
    assert min(recalls) >= 0.4, f"PQ worst-query recall collapsed: {min(recalls):.3f}"

    rerun = pq_ann_topk(queries, emb).orderBy("query_id", "rk").toPandas()
    assert pq.equals(rerun), "PQ codebook/scoring must be deterministic"

    # every shortlisted winner's cos_sim is an exact score: re-ranked pairs
    # must agree with the exact fold wherever both rank the same pair
    merged = pq.merge(exact, on=["query_id", "cand_id"], suffixes=("_pq", "_ex"))
    assert (merged["cos_sim_pq"] - merged["cos_sim_ex"]).abs().max() == 0.0

    # the registered audit view asserts the band and matches exact top-1
    audit = reg["q140_pq_ann_topk"].fn(spark, sf_dir).toPandas()
    assert audit["recall_within_band"].all()
    top1 = exact[exact["rk"] == 1].set_index("query_id")["cand_id"]
    got1 = audit.set_index("query_id")["exact_top1_cand"]
    assert (top1.sort_index() == got1.sort_index()).all()


def test_ivf_and_pq_deterministic_under_repartition(spark, sf_dir):
    """Shuffle-order independence: the same top-k sets must come back
    regardless of how the input happens to be partitioned — pins that
    centroid training / probe selection / shortlist ranking carry no
    hidden dependence on partition layout or row order."""
    from pyspark_anomaly_detection_spark.similarity.ann import pq_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)

    base_ivf = {
        (r.query_id, r.cand_id) for r in ivf_topk(emb, queries).collect()
    }
    repart_ivf = {
        (r.query_id, r.cand_id)
        for r in ivf_topk(emb.repartition(13), queries.repartition(5)).collect()
    }
    assert base_ivf == repart_ivf

    base_pq = {
        (r.query_id, r.cand_id) for r in pq_ann_topk(queries, emb).collect()
    }
    repart_pq = {
        (r.query_id, r.cand_id)
        for r in pq_ann_topk(
            queries.repartition(7), emb.repartition(13)
        ).collect()
    }
    assert base_pq == repart_pq


def test_pq_and_ivf_tiny_inputs(spark):
    """Robustness: candidate sets smaller than the centroid count must
    still train (tiled init), and empty candidates fail loudly."""
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.similarity.ann import (
        pq_ann_topk,
        pq_train_codebook,
    )
    from pyspark_anomaly_detection_spark.similarity.neardup import ivf_topk

    tiny = spark.createDataFrame(
        [(i, [float(i + 1)] * 8) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    out = pq_ann_topk(tiny.filter(F.col("vec_id") < 2), tiny, k=3, m=2, kc=16)
    assert out.count() == 2 * 3
    # parallel vectors land in magnitude-split cells, so probing may
    # find fewer than k candidates per query — robustness claim only
    got = ivf_topk(tiny, tiny.filter(F.col("vec_id") < 2), k=3)
    assert 0 < got.count() <= 2 * 3

    empty = tiny.filter(F.col("vec_id") < 0)
    with _pytest.raises(Exception, match="empty candidate"):
        pq_train_codebook(empty)


def test_or_amplified_blocking_recall(spark, sf_dir):
    """ADVICE r15: containment-only checks let blocking recall collapse
    invisibly (growing a single band to 8 planes left near-threshold
    recall at ~0.62^8).  The OR-amplified lane must clear the same
    floors the parity sweep enforces: every exact-duplicate pair found,
    overall recall ≥ NEARDUP_RECALL_FLOOR, and more tables ⇒ recall
    monotonically non-decreasing (superset candidate exposure)."""
    from tools.parity_check import NEARDUP_RECALL_FLOOR

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_neardup_pairs(emb).toPandas()
    amped = lsh_blocked_neardup(emb, n_tables=8).toPandas()
    single = lsh_blocked_neardup(emb, n_tables=1).toPandas()
    key = ["a_id", "b_id"]
    assert len(amped.merge(exact, on=key)) == len(amped), "containment"
    assert len(amped) / len(exact) >= NEARDUP_RECALL_FLOOR
    # OR-amplification only ADDS tables: single-table pairs ⊆ amped pairs
    assert len(single.merge(amped, on=key)) == len(single)
    dup = exact[exact["cos_sim"] >= 0.999]
    assert len(amped.merge(dup, on=key)) == len(dup), "exact-dup recall"
