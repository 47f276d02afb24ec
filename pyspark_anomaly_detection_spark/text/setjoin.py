"""Exact set-similarity join via prefix filtering (PPJoin-style) — the
third dedup family alongside MinHash-LSH (probabilistic, text/dedup.py)
and embedding LSH (semantic, similarity/neardup.py): EXACT Jaccard pairs
at scale without the all-pairs product.

Set elements are the SAME 3-gram shingles the MinHash pipeline hashes
(functions.shingles) — NOT unigram tokens: this corpus draws from a
~40-word vocabulary, so every document contains most of the vocabulary
and unigram-set Jaccard is degenerate (measured at sf0.1: 8.9M of 12.5M
possible pairs exceed 0.5).  Shingling restores a large element universe
(distinct-trigram sets; ~256 true pairs ≥0.5 at sf0.1), which is also
what makes prefix filtering selective.  Each shingle is represented as
its 60-bit md5 long (functions.MD5_LONG60_SQL — the same portable hash
family the MinHash/CMS operators use): both engines compute the
identical md5, so oracle parity is exact by construction, and the
shuffled set elements are 8-byte longs instead of ~20-byte strings.

The prefix-filter principle (Chaudhuri et al. SSJoin / Xiao et al.
PPJoin, both public): order every set by one global total order
(ascending document frequency, ties by element), keep only the first
``n − ⌈θ·n⌉ + 1`` elements of each set as its *prefix*; any pair with
Jaccard ≥ θ MUST share at least one prefix element.  Candidate
generation is an equi-join on prefix elements — shuffle key = element —
plus the PPJoin length filter (J ≥ θ forces θ·|a| ≤ |b| ≤ |a|/θ), and
each surviving candidate is verified exactly.

Scale notes: the inverted index shuffles (element, doc_id, set_size)
triples only — never text; the hot keys are the RAREST elements by
construction (df-ascending order), the opposite of the skew a naive
token join has.  The verify step joins long-array set columns by doc_id
(JVM-side ``array_intersect``).  At 100 TB the same plan holds: df table
and prefix explode are linear, candidates ≈ true pairs + small noise.

Oracle: DuckDB computes the literal all-pairs Jaccard via an element
self-join — O(pairs sharing any element), fine at sf0.01, and exactly
the semantics the prefix filter must reproduce (completeness is the
whole claim of the algorithm, so the oracle deliberately does NOT
prefix-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.cachepool import tracked_persist
from pyspark_anomaly_detection_spark.functions import (
    MD5_LONG60_SQL,
    md5_long60,
    shingles,
    shingles_sql,
    tokens,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Jaccard threshold for the registered query (and its oracle).
JACCARD_THRESHOLD = 0.5

#: Shingle width — matches the MinHash pipeline (text/dedup.py SHINGLE_N).
SHINGLE_N = 3

#: Regex split used by the BM25/token-stats family (text/search.py).
TOKEN_SPLIT = "[^a-z0-9]+"


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, elem) distinct pairs — sets of 60-bit md5 shingle hashes."""
    # tokenize once (r16, see dedup.minhash_signatures_df): an inline
    # tokens() inside the shingle lambda re-splits the text per shingle
    return (
        docs.select("doc_id", tokens("text").alias("_tok"))
        .select(
            "doc_id",
            F.explode(shingles(F.col("_tok"), SHINGLE_N)).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .select("doc_id", md5_long60(F.col("shingle")).alias("elem"))
        .distinct()
    )


def _prefix_stage(
    docs: DataFrame, threshold: float
) -> tuple[DataFrame, DataFrame]:
    """(per_doc, candidate pairs) — the blocking half of the PPJoin.

    Split out so tests can pin BLOCKING quality numerically
    (|candidates| vs |true pairs| — tests/test_blocking_telemetry.py),
    not just the end result."""
    # The distinct (doc_id, elem) set feeds BOTH the df ranking and the
    # per-doc aggregation, and per_doc below feeds three join legs —
    # persist both so the shingle explode/distinct runs once, not 8×
    # (same lesson as q149's edge-list cache; PLAN_AUDIT pins the scan
    # count).
    sh = tracked_persist(shingle_sets(docs))

    # Global order: ascending doc-frequency, ties by element value.
    df_rank = sh.groupBy("elem").agg(F.count("*").alias("df"))
    ranked = sh.join(df_rank, "elem")

    # Per-doc sorted element array (df asc, elem asc) — array_sort on a
    # (df, elem) struct gives every doc the identical global order.
    per_doc = ranked.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct(F.col("df"), F.col("elem")))).alias(
            "ordered"
        ),
    )
    per_doc = per_doc.select(
        "doc_id",
        F.transform("ordered", lambda s: s["elem"]).alias("elems"),
        F.size("ordered").alias("n_elems"),
    )
    per_doc = tracked_persist(
        per_doc.withColumn(
            # PPJoin prefix length for Jaccard θ: n − ⌈θ·n⌉ + 1
            "prefix_len",
            F.col("n_elems") - F.ceil(F.lit(threshold) * F.col("n_elems")) + 1,
        )
    )

    prefix = per_doc.select(
        "doc_id",
        "n_elems",
        F.explode(F.slice("elems", 1, F.col("prefix_len"))).alias("elem"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, "elem")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J ≥ θ ⇒ θ·|a| ≤ |b| and θ·|b| ≤ |a|
            & (
                F.col("b.n_elems").cast("double")
                >= F.lit(threshold) * F.col("a.n_elems").cast("double")
            )
            & (
                F.col("a.n_elems").cast("double")
                >= F.lit(threshold) * F.col("b.n_elems").cast("double")
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return per_doc, cands


def prefix_jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """All (doc_a < doc_b) pairs with shingle-set Jaccard ≥ threshold —
    exact result, prefix-filtered + length-filtered candidates.

    Verify stage (VERDICT r16 item 5): ONE doc-keyed join instead of
    two.  The old shape joined the persisted per-doc arrays once per
    pair side (cands⋈per_doc on doc_a, then ⋈per_doc on doc_b — the
    mid-join rows carried ``elems_a`` through the doc_b exchange), i.e.
    per_doc shuffled twice and the arrays three times.  Now each
    candidate explodes into its two (pair, doc_id) sides — explode, not
    a self-union, so the candidate pipeline is planned once — joins
    per_doc ONCE on doc_id, and a (doc_a, doc_b) hash aggregate packs
    the two sides back into one row (guide §2.3/§2.4: one fewer
    exchange, each doc's array crosses the wire once per side instead
    of per leg)."""
    per_doc, cands = _prefix_stage(docs, threshold)

    sides = cands.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a"), F.col("doc_b"), F.col("doc_a").alias("doc_id")
                ),
                F.struct(
                    F.col("doc_a"), F.col("doc_b"), F.col("doc_b").alias("doc_id")
                ),
            )
        ).alias("s")
    ).select("s.doc_a", "s.doc_b", "s.doc_id")
    packed = (
        sides.join(per_doc.select("doc_id", "elems", "n_elems"), "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max(
                F.when(
                    F.col("doc_id") == F.col("doc_a"),
                    F.struct("elems", "n_elems"),
                )
            ).alias("A"),
            F.max(
                F.when(
                    F.col("doc_id") == F.col("doc_b"),
                    F.struct("elems", "n_elems"),
                )
            ).alias("B"),
        )
    )
    inter = F.size(F.array_intersect("A.elems", "B.elems"))
    jaccard = inter.cast("double") / (
        F.col("A.n_elems") + F.col("B.n_elems") - inter
    ).cast("double")
    return (
        packed.select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            F.col("A.n_elems").alias("n_a"),
            F.col("B.n_elems").alias("n_b"),
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


_SHINGLES_SQL = shingles_sql("str_split(text, chr(32))", SHINGLE_N)
_ELEM_SQL = MD5_LONG60_SQL.format(x="shingle")


#: Exact all-pairs shingle-Jaccard formulation in DuckDB SQL — the q166
#: oracle body, exported so other promotions (q171's MLlib recall audit)
#: can reuse the independent exact-pair computation.
EXACT_JACCARD_PAIRS_SQL = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {_ELEM_SQL} AS elem FROM (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
        FROM documents
      ) WHERE shingle <> ''
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS INT) AS inter
      FROM sh a JOIN sh b ON a.elem = b.elem AND a.doc_id < b.doc_id
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
"""


@register(
    "q166_prefix_jaccard_pairs",
    oracle=EXACT_JACCARD_PAIRS_SQL + "    ORDER BY doc_a, doc_b\n    ",
)
def q166_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard ≥ 0.5 document pairs via prefix-filtered
    set-similarity join; the oracle runs the unfiltered all-pairs
    formulation, so a green hash proves the prefix filter's completeness,
    not just the verify step."""
    return prefix_jaccard_pairs(load_table(spark, sf_dir, "documents"))
