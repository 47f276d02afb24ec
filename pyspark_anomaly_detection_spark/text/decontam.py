"""Benchmark decontamination — the training-corpus hygiene step every
serious LLM data pipeline runs (GPT-3 appendix C, PaLM, Llama): remove
or flag training documents that overlap the EVALUATION set's n-grams,
so benchmark scores measure generalization instead of memorization.

Unlike dedup (symmetric, corpus-vs-itself), decontamination is an
ASYMMETRIC join of a huge corpus against a small benchmark set — the
scale shape is therefore different and simpler:

* the benchmark side (thousands of eval documents, even for a big
  suite) reduces to a DISTINCT set of hashed contamination n-grams —
  small enough to BROADCAST, so the corpus side never shuffles for the
  membership test;
* the corpus side explodes its per-doc distinct n-grams (md5-hashed to
  fixed-width longs — the same portable hash family as the MinHash
  lane, so DuckDB rebuilds identical values), hits the broadcast set
  with a map-side LEFT SEMI join, and aggregates hit counts per doc —
  ONE shuffle, keyed by the high-cardinality doc_id;
* output is the keep/drop manifest (doc_id, n-gram totals,
  contaminated fraction, drop verdict) a pipeline applies before
  tokenization, like the q204 LSH manifest.

At 100 TB: corpus n-gram explosion is the dominant cost — linear in
corpus tokens, embarrassingly parallel, no skew (n-gram hashes
distribute uniformly); the benchmark broadcast is constant-size.

Reference parity: the reference has no decontamination (its pipeline is
tabular anomaly detection); this is a beyond-reference LLM-pipeline
operator from the brief's north-star list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import (
    MD5_LONG60_SQL,
    md5_long60,
    shingles,
    shingles_sql,
    tokens,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Contamination n-gram width.  Real pipelines use 8-13; the synthetic
#: corpus has short documents, so 5 keeps the overlap census non-trivial
#: while exercising the identical plan shape.
CONTAM_N = 5

#: Every doc_id % 17 == 0 document plays the "benchmark" (eval set);
#: the rest are the training corpus being decontaminated.
CONTAM_BENCH_MOD = 17

#: Drop a document when at least this fraction of its distinct n-grams
#: appears in the benchmark set.
CONTAM_DROP_FRAC = 0.2


def benchmark_decontamination(
    docs: DataFrame,
    n: int = CONTAM_N,
    bench_mod: int = CONTAM_BENCH_MOD,
    drop_frac: float = CONTAM_DROP_FRAC,
) -> DataFrame:
    """Per-corpus-document contamination manifest against the keyed
    benchmark subset: (doc_id, n_shingles, n_contaminated, contam_frac,
    drop_doc).  Documents shorter than ``n`` tokens have no n-grams and
    are clean by definition."""
    is_bench = F.col("doc_id") % bench_mod == 0
    # tokenize once (r16, see dedup.minhash_signatures_df): an inline
    # tokens() inside the shingle lambda re-splits the text per shingle
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_tok"))
    sh = F.array_distinct(shingles(F.col("_tok"), n))
    bench = (
        toked.filter(is_bench)
        .select(F.explode(sh).alias("sh"))
        .select(md5_long60(F.col("sh")).alias("h"))
        .distinct()
    )
    # SINGLE corpus pass (r16 optimization, guide §2.3/§2.4): the old
    # shape computed the shingle arrays twice — once for a per-doc size
    # projection, once for the hit census — and re-joined the two legs
    # by doc_id (3 documents scans, 2 corpus-keyed shuffles).
    # explode_outer keeps zero-shingle docs (NULL element → n_shingles
    # 0), a broadcast LEFT join marks benchmark hits, and ONE doc_id
    # aggregation counts both totals — 2 scans, 1 shuffle.  With the
    # tokenize-once fix this took q222 from 7.49 s to 1.26 s at sf0.1
    # (bench --only, 3-rep trimmed mean).  Output bitwise-identical
    # (oracle-verified at sf0.001/0.01/0.1).
    corpus = (
        toked.filter(~is_bench)
        .select("doc_id", F.explode_outer(sh).alias("sh"))
        .select("doc_id", md5_long60(F.col("sh")).alias("h"))
    )
    marked = corpus.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "h", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("h").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
    )
    frac = F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
        F.col("n_contaminated").cast("double") / F.col("n_shingles")
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        frac.alias("contam_frac"),
    ).withColumn("drop_doc", F.col("contam_frac") >= F.lit(drop_frac))


_SH_SQL = shingles_sql("str_split(text, chr(32))", CONTAM_N)
_H_SQL = MD5_LONG60_SQL.format(x="sh")


@register(
    "q222_benchmark_decontamination",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT {_H_SQL} AS h
      FROM (
        SELECT unnest(list_distinct({_SH_SQL})) AS sh
        FROM documents WHERE doc_id % {CONTAM_BENCH_MOD} = 0
      )
    ),
    corpus AS (
      SELECT doc_id, list_distinct({_SH_SQL}) AS shs
      FROM documents WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
    ),
    expl AS (
      SELECT doc_id, {_H_SQL} AS h
      FROM (SELECT doc_id, unnest(shs) AS sh FROM corpus)
    ),
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
      FROM expl WHERE h IN (SELECT h FROM bench) GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(len(c.shs) AS BIGINT) AS n_shingles,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           CASE WHEN len(c.shs) = 0 THEN 0.0
                ELSE CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
                     / len(c.shs) END AS contam_frac,
           (CASE WHEN len(c.shs) = 0 THEN 0.0
                 ELSE CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
                      / len(c.shs) END) >= {CONTAM_DROP_FRAC}
             AS drop_doc
    FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
    ORDER BY c.doc_id
    """,
)
def q222_benchmark_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keep/drop decontamination manifest of the corpus against the
    keyed benchmark subset — asymmetric n-gram membership via a
    broadcast of the (small) benchmark's hashed n-gram set, ONE corpus
    shuffle on doc_id.  The portable md5 hash family lets DuckDB
    rebuild identical n-gram hashes, hit counts, fractions, and
    verdicts — fully oracle-hashed."""
    docs = load_table(spark, sf_dir, "documents")
    return benchmark_decontamination(docs).orderBy("doc_id")
