"""Compressibility quality signal: hand-computed zlib ratios, redundancy
monotonicity, and the per-source profile row shape."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.text.stats import (
    LOW_COMPRESS_RATIO,
    ZLIB_LEVEL,
    compressibility,
)


def test_compressibility_matches_local_zlib(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog in the yard"),
        (1, "spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "x" * 400),
        (3, "a perfectly ordinary sentence with varied words here"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: r for r in compressibility(df).collect()}
    for doc_id, text in texts:
        b = text.encode("utf-8")
        assert got[doc_id].raw_len == len(b)
        assert got[doc_id].comp_len == len(zlib.compress(b, ZLIB_LEVEL))
        assert got[doc_id].ratio == got[doc_id].comp_len / got[doc_id].raw_len
    # long-range redundancy compresses harder than varied prose
    assert got[2].ratio < got[1].ratio < got[0].ratio
    assert got[2].ratio < LOW_COMPRESS_RATIO  # degenerate text is flagged


def test_q174_per_source_profile(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.registry import all_queries

    rows = all_queries()["q174_compressibility_quality"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    total = sum(r.n_docs for r in rows)
    assert total == docs.count()
    # audit view since the r11 oracle promotion: per-source verdicts TRUE
    for r in rows:
        assert r.ratios_positive_finite
        assert r.min_le_mean
        assert r.boilerplate_subset


def test_compressibility_deterministic_across_partitionings(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.comp_len) for r in compressibility(docs).collect()}
    b = {
        (r.doc_id, r.comp_len)
        for r in compressibility(docs.repartition(13)).collect()
    }
    assert a == b


# ------------------- round 7: per-language quantile gate (q197)


def test_lang_quantile_gate_drops_bottom_quintile_per_group(spark):
    """Two languages with disjoint diversity ranges: an absolute
    threshold would drop all of the low-diversity language; the quantile
    gate drops exactly the bottom 20% WITHIN each."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.text.stats import lang_quantile_gate

    def doc(i, lang, n_distinct, n_total=10):
        words = [f"w{k}" for k in range(n_distinct)]
        toks = (words * n_total)[:n_total]
        return (i, lang, " ".join(toks))

    rows = [doc(i, "aa", i + 1) for i in range(10)]          # diversity .1–1.
    rows += [doc(100 + i, "bb", 1 + i % 3) for i in range(10)]  # low range
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = lang_quantile_gate(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        dropped = [r for r in rs if not r.keep]
        assert 0 < len(dropped) <= 2 + 1, (lang, len(dropped))  # ~bottom 20%
        worst = min(rs, key=lambda r: (r.lexical_diversity, r.doc_id))
        assert not worst.keep, f"{lang}: worst doc survived"
        best = max(rs, key=lambda r: (r.lexical_diversity, r.doc_id))
        assert best.keep
    # percent_rank bounds
    assert all(0.0 <= r.pr <= 1.0 for r in out)
