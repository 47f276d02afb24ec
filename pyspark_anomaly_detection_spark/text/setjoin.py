"""Exact set-similarity join via prefix filtering (PPJoin-style) — the
third dedup family alongside MinHash-LSH (probabilistic, text/dedup.py)
and embedding LSH (semantic, similarity/neardup.py): EXACT Jaccard pairs
at scale without the all-pairs product.

The prefix-filter principle (Chaudhuri et al. SSJoin / Xiao et al.
PPJoin, both public): order every token set by one global total order
(ascending document frequency, ties by token), keep only the first
``n − ⌈θ·n⌉ + 1`` tokens of each set as its *prefix*; any pair with
Jaccard ≥ θ MUST share at least one prefix token.  Candidate generation
is then an equi-join on prefix tokens — shuffle key = token — and each
candidate is verified exactly.  Rare-token-first ordering makes prefixes
collide rarely, so the candidate set stays near-linear.

Scale notes: the inverted index shuffles (token, doc_id) pairs only —
never text; the hot keys are the RAREST tokens by construction (df-
ascending order), the opposite of the skew a naive token join has.  The
verify step joins token arrays by doc_id (sorted-set intersection,
JVM-side ``array_intersect``).  At 100 TB the same plan holds: df table
and prefix explode are linear, candidates ≈ true pairs + small noise.

Oracle: DuckDB computes the literal all-pairs Jaccard via a token
self-join — O(pairs sharing any token), fine at sf0.01, and exactly the
semantics the prefix filter must reproduce (completeness is the whole
claim of the algorithm, so the oracle deliberately does NOT prefix-
filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Jaccard threshold for the registered query (and its oracle).
JACCARD_THRESHOLD = 0.5

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_distinct(docs: DataFrame) -> DataFrame:
    """(doc_id, token) distinct pairs: lowercase, split on non-alnum."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), TOKEN_SPLIT)).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def prefix_jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """All (doc_a < doc_b) pairs with token-set Jaccard ≥ threshold —
    exact result, prefix-filtered candidate generation."""
    tok = tokenize_distinct(docs)

    # Global token order: ascending doc-frequency, ties by token string.
    df_rank = tok.groupBy("token").agg(F.count("*").alias("df"))
    ranked = tok.join(df_rank, "token")

    # Per-doc sorted token array (df asc, token asc) — array_sort on a
    # (df, token) struct gives every doc the identical global order.
    per_doc = ranked.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("df"), F.col("token")))
        ).alias("ordered"),
    )
    per_doc = per_doc.select(
        "doc_id",
        F.transform("ordered", lambda s: s["token"]).alias("tokens"),
        F.size("ordered").alias("n_tok"),
    ).withColumn(
        # PPJoin prefix length for Jaccard θ: n − ⌈θ·n⌉ + 1
        "prefix_len",
        F.col("n_tok") - F.ceil(F.lit(threshold) * F.col("n_tok")) + 1,
    )

    prefix = per_doc.select(
        "doc_id",
        F.explode(F.slice("tokens", 1, F.col("prefix_len"))).alias("token"),
    )
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    left = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tokens").alias("tokens_a"),
        F.col("n_tok").alias("n_a"),
    )
    right = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tokens").alias("tokens_b"),
        F.col("n_tok").alias("n_b"),
    )
    inter = F.size(F.array_intersect("tokens_a", "tokens_b"))
    jaccard = inter.cast("double") / (
        F.col("n_a") + F.col("n_b") - inter
    ).cast("double")
    return (
        cands.join(left, "doc_a")
        .join(right, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            "n_a",
            "n_b",
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "q152_prefix_jaccard_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'))
                 AS token
        FROM documents
      ) WHERE token <> ''
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM tok GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS INT) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT
      doc_a, doc_b, inter,
      sa.n AS n_a, sb.n AS n_b,
      CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE)
          >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def q152_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.5 document pairs via prefix-filtered set-
    similarity join; the oracle runs the unfiltered all-pairs formulation,
    so a green hash proves the prefix filter's completeness, not just the
    verify step."""
    return prefix_jaccard_pairs(load_table(spark, sf_dir, "documents"))
