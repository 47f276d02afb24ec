"""Full-text relevance ranking — BM25 scoring over the documents corpus,
the retrieval-side complement of the inverted index (q97) and the
TF-IDF-shaped keyword extraction (q77).

BM25 (Robertson/Spärck Jones, public): for query term t and document d,

    idf(t)  = ln( (N − df + 0.5) / (df + 0.5) + 1 )          (Lucene form)
    score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

Every operand is an exact integer (tf, df, dl, N) or a single division of
exact operands (avgdl), and the floating-point expression is written with
the same association order in Spark and the DuckDB oracle, so the scores
hash identically.  The ONE non-arithmetic op, ln, is NOT ulp-identical
between JVM ``Math.log`` and glibc (probed: x=1.3166885676741131 differs
in the last bit) — so the idf factors are computed driver-side with
Python's glibc ``math.log`` from a collected 3-row (term, df) aggregate
plus the 1-row corpus stats, and injected as literals.  DuckDB's ``LN``
is the same glibc call, so the oracle can keep computing it in SQL.

Scale notes: one scan tokenizes; tf/dl/df are hash aggregations
(map-side partial); the df table is filtered to the query terms BEFORE
joining (a handful of rows → broadcast); the per-(doc,term) score join
keys on token — shuffle carries (doc_id, token, tf) only, never text.
Top-k via orderBy+limit plans TakeOrderedAndProject.  At 100 TB the same
plan is the standard "score a small query against a corpus" shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register
from pyspark_anomaly_detection_spark.text.setjoin import TOKEN_SPLIT

QUERY_TERMS = ("spark", "window", "join")
K1 = 1.2
#: k1+1 as ONE literal on both sides: "1.2 + 1.0" evaluates in DECIMAL in
#: DuckDB (exactly 2.2, then → double) but in binary doubles in Spark —
#: one ulp apart.  A single decimal literal converts identically.
K1_PLUS_1 = 2.2
B = 0.75
TOP_K = 20


@register(
    "q167_bm25_ranking",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'))
                 AS token
        FROM documents
      ) WHERE token <> ''
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf
      WHERE token IN {QUERY_TERMS!r}
      GROUP BY token
    ),
    scored AS (
      SELECT
        doc_id, token,
        LN((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)
           + 1.0)
        * (CAST(tf AS DOUBLE) * {K1_PLUS_1})
        / (CAST(tf AS DOUBLE)
           + {K1} * (1.0 - {B} + {B} * (CAST(dl AS DOUBLE) / avgdl)))
          AS term_score
      FROM tf
      JOIN df USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT
      doc_id,
      -- fixed-order 3-term add: each per-term SUM has at most one nonzero
      -- element (plus exact +0.0s), so the total is order-independent
      SUM(CASE WHEN token = '{QUERY_TERMS[0]}' THEN term_score ELSE 0.0 END)
      + SUM(CASE WHEN token = '{QUERY_TERMS[1]}' THEN term_score ELSE 0.0 END)
      + SUM(CASE WHEN token = '{QUERY_TERMS[2]}' THEN term_score ELSE 0.0 END)
        AS bm25,
      CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {TOP_K}
    """,
)
def q167_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for the fixed query {spark, window, join}.
    The (term, df) aggregate and corpus stats are collected (3 rows + 1
    row — the legitimate tiny-side collect, like the ANN query matrix)
    so idf can use glibc ln; the big-side plan is one tf shuffle with
    the idf map applied as a literal CASE."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), TOKEN_SPLIT)).alias("token"),
    ).filter(F.col("token") != "")

    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs, avgdl = (
        dl.agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
                "avgdl"
            ),
        )
        .collect()[0]
    )
    df_rows = (
        tf.filter(F.col("token").isin(*QUERY_TERMS))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    idf_by_token = {
        r.token: math.log(
            (float(n_docs - r.df) + 0.5) / (float(r.df) + 0.5) + 1.0
        )
        for r in df_rows
    }

    if not idf_by_token:
        # none of the query terms occur in the corpus — an .isin() with
        # zero arguments raises, so return the empty result explicitly
        # (the oracle side also yields 0 rows).
        return (
            tf.filter(F.lit(False))
            .join(dl, "doc_id")
            .groupBy("doc_id")
            .agg(
                F.sum(F.lit(0.0)).alias("bm25"),
                F.count("*").alias("n_terms_hit"),
            )
        )

    idf = F.lit(None).cast("double")
    for token, value in idf_by_token.items():
        idf = F.when(F.col("token") == token, F.lit(value)).otherwise(idf)
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(K1) * (
        F.lit(1.0) - F.lit(B) + F.lit(B) * (F.col("dl").cast("double") / F.lit(avgdl))
    )
    term_score = idf * (tf_d * F.lit(K1_PLUS_1)) / norm

    def term_sum(term: str):
        # at most one nonzero element per doc → order-independent double sum
        return F.sum(
            F.when(F.col("token") == term, term_score).otherwise(F.lit(0.0))
        )

    return (
        tf.filter(F.col("token").isin(*idf_by_token))
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            (
                term_sum(QUERY_TERMS[0])
                + term_sum(QUERY_TERMS[1])
                + term_sum(QUERY_TERMS[2])
            ).alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(TOP_K)
    )
