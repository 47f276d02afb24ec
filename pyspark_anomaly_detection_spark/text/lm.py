"""Reference-language-model quality filtering — the CCNet/KenLM step of
LLM data pipelines: score every document by how well a language model
trained on a HIGH-QUALITY reference corpus predicts its tokens, and
gate on the score (CCNet buckets CommonCrawl by Wikipedia-LM
perplexity).

This implements the unigram form with EXACT cross-engine arithmetic.
True perplexity needs a per-token ``Σ log p`` whose floating sum order
is not reproducible across engines (and 1-ulp libm ``log`` differences
compound), so the score here is the add-one-smoothed MEAN TOKEN
LIKELIHOOD — ``Σ (c_i + 1) / (n · (N + V + 1))`` — which stays in
exact BIGINT arithmetic until a single final IEEE division, is monotone
in the same direction (reference-like text scores high, out-of-domain
and OOV-heavy text low), and hash-matches DuckDB bit-for-bit.  The
OOV fraction (CCNet's companion signal) comes out of the same pass.

Scale shape (100 TB):

* the reference LM trains in ONE aggregate over the reference slice
  (token → count) — the vocabulary table is the only state;
* scoring explodes corpus tokens and LEFT JOINs the vocabulary on the
  token — a high-cardinality shuffle key with near-uniform load (token
  skew is bounded by stopword frequency, and AQE splits hot keys);
* the two LM scalars (N total tokens, V vocabulary size) collect to
  the driver as TWO numbers and re-enter as literals — no 1-row
  cross-join (BroadcastNestedLoop) in the plan;
* per-doc aggregation shuffles on doc_id.

Reference parity: not in the reference repo (tabular pipeline); a
beyond-reference LLM-pipeline operator alongside q222's
decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import tokens
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: The high-quality reference slice the unigram LM trains on (CCNet
#: trains on Wikipedia; the synthetic corpus's English slice plays that
#: role — other languages then score low, which is the point).
LM_REF_LANG = "en"

#: Keep threshold on mean token likelihood.  Reference-like documents
#: sit orders of magnitude above OOV-heavy ones (see tests), so the
#: gate is threshold-robust.
LM_KEEP_LIKELIHOOD = 1e-4


def reference_lm_counts(docs: DataFrame, ref_lang: str = LM_REF_LANG):
    """(token → count) vocabulary of the reference slice, plus the
    (N, V) scalars — one aggregate pass."""
    counts = (
        docs.filter(F.col("lang") == ref_lang)
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    return counts


def lm_quality_scores(
    docs: DataFrame,
    ref_lang: str = LM_REF_LANG,
    keep_likelihood: float = LM_KEEP_LIKELIHOOD,
) -> DataFrame:
    """Per-document (n_tokens, sum_counts, oov, oov_frac,
    mean_likelihood, keep_doc) under the add-one-smoothed reference
    unigram LM.  All aggregates exact BIGINTs; the two final ratios are
    single IEEE divisions — bitwise cross-engine."""
    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    counts = tracked_persist(reference_lm_counts(docs, ref_lang))
    nv = counts.agg(
        F.sum("c").alias("N"), F.count("*").alias("V")
    ).first()
    denom_scalar = int(nv.N or 0) + int(nv.V or 0) + 1
    per_doc = (
        docs.select(
            "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .join(counts, "tok", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("sum_counts"),
            F.sum(F.col("c").isNull().cast("long")).alias("oov"),
        )
    )
    mean_lik = (F.col("sum_counts") + F.col("n_tokens")).cast("double") / (
        F.col("n_tokens") * F.lit(denom_scalar)
    )
    return per_doc.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("sum_counts").cast("long").alias("sum_counts"),
        F.col("oov").cast("long").alias("oov"),
        (F.col("oov").cast("double") / F.col("n_tokens")).alias("oov_frac"),
        mean_lik.alias("mean_likelihood"),
        (mean_lik >= F.lit(keep_likelihood)).alias("keep_doc"),
    )


@register(
    "q223_lm_quality_filter",
    oracle=f"""
    WITH ref AS (
      SELECT unnest(str_split(text, chr(32))) AS tok
      FROM documents WHERE lang = '{LM_REF_LANG}'
    ),
    counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM ref GROUP BY tok
    ),
    nv AS (
      SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0)
               + CAST(COUNT(*) AS BIGINT) + 1 AS denom
      FROM counts
    ),
    toks AS (
      SELECT doc_id, lang, unnest(str_split(text, chr(32))) AS tok
      FROM documents
    ),
    per AS (
      SELECT t.doc_id, t.lang,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(COALESCE(c.c, 0)) AS BIGINT) AS sum_counts,
             CAST(SUM(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov
      FROM toks t LEFT JOIN counts c USING (tok)
      GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, n_tokens, sum_counts, oov,
           CAST(oov AS DOUBLE) / n_tokens AS oov_frac,
           CAST(sum_counts + n_tokens AS DOUBLE)
             / (n_tokens * (SELECT denom FROM nv)) AS mean_likelihood,
           (CAST(sum_counts + n_tokens AS DOUBLE)
             / (n_tokens * (SELECT denom FROM nv)))
             >= {LM_KEEP_LIKELIHOOD} AS keep_doc
    FROM per
    ORDER BY doc_id
    """,
)
def q223_lm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped reference-LM quality gate over the whole corpus.
    (The synthetic corpus shares one token vocabulary across its lang
    labels, so all its docs score in-domain here; the gate's
    discrimination — OOV-heavy text scoring orders of magnitude lower
    and dropping — is pinned by tests/test_lm_quality.py's planted
    fixtures.)  Every aggregate is exact-integer, the ratios single
    IEEE divisions — fully oracle-hashed."""
    docs = load_table(spark, sf_dir, "documents")
    return lm_quality_scores(docs).orderBy("doc_id")
