"""Canonical-URL dedup (q211) — the crawl-side twin of content dedup:
the same page reaches a crawler as case variants, default-port forms,
fragment-bearing links, dot-segment paths, duplicate/trailing slashes,
and reordered query strings; canonicalization collapses them BEFORE any
expensive content hashing.

The census synthesizes six messy variants per URL group closed-form in
doc_id (both engines build identical strings), canonicalizes with the
:func:`functions.canonical_url` / ``canonical_url_sql`` twins, and
groups — so the entire normalization chain (regex passes + query-param
sort) is hash-verified, JVM-only on the Spark side (no Python lane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import (
    canonical_url,
    canonical_url_sql,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: The six messifications, keyed by doc_id % 6.  All canonicalize to
#: https://docs.example.com/a/<g>?x=1&y=2 with g = doc_id // 6.
_VARIANTS_SPARK = [
    ("https://Docs.Example.com/a/", "?x=1&y=2"),
    ("https://docs.example.com:443/a/", "?y=2&x=1"),
    ("HTTPS://docs.example.com/a/./", "?x=1&y=2#frag"),
    ("https://docs.example.com//a//", "?x=1&y=2"),
    ("https://docs.example.com/a/", "/?x=1&y=2"),
    ("https://docs.example.com/a/", "?x=1&y=2&"),
]


def _messy_url_spark() -> F.Column:
    g = F.expr("(doc_id - pmod(doc_id, 6)) div 6").cast("string")
    v = F.col("doc_id") % 6
    expr = F.lit(None).cast("string")
    for i, (pre, post) in enumerate(_VARIANTS_SPARK):
        expr = F.when(v == i, F.concat(F.lit(pre), g, F.lit(post))).otherwise(
            expr
        )
    return expr


def _messy_url_sql() -> str:
    g = "CAST((doc_id - (doc_id % 6)) // 6 AS VARCHAR)"
    cases = " ".join(
        f"WHEN {i} THEN '{pre}' || {g} || '{post}'"
        for i, (pre, post) in enumerate(_VARIANTS_SPARK)
    )
    return f"(CASE doc_id % 6 {cases} END)"


@register(
    "q211_url_canonical_dedup",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_messy_url_sql()} AS raw_url FROM documents
    ),
    canon AS (
      SELECT doc_id, raw_url,
             {canonical_url_sql('raw_url')} AS canonical
      FROM urls
    )
    SELECT canonical,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_forms,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM canon
    GROUP BY canonical
    ORDER BY min_doc
    """,
)
def q211_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization census: six distinct raw forms per page
    collapse to one canonical key.  Fully JVM (regex + array ops inside
    whole-stage codegen); the DuckDB twin re-implements the identical
    normalization, so the hash verifies every regex pass and the
    query-param sort."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    canon = docs.select(
        "doc_id",
        _messy_url_spark().alias("raw_url"),
    ).select(
        "doc_id",
        "raw_url",
        canonical_url(F.col("raw_url")).alias("canonical"),
    )
    return (
        canon.groupBy("canonical")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_url").alias("n_raw_forms"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("min_doc")
    )
