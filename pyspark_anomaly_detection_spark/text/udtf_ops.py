"""Python UDTF surface (SURVEY §2.9 — the reference has no UDF/UDAF/UDTF;
this engine demonstrates all three tiers: pandas_udf in text.dedup.simhash64,
grouped applyInPandas* in streaming.stateful, and the table function here).

``split_sentences`` is a lateral-view-style UDTF: one input document row →
one output row per sentence, with position and char offsets.  UDTFs run
row-at-a-time in Python — the SLOW tier (no Arrow batching in the eval
loop) — so the policy stands: use them only for genuinely table-valued
logic that higher-order functions can't express, never in the relational
hot path.  Registered rows-only (Python-side splitting has no SQL oracle;
the invariants are pytest-pinned instead).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

_SENTENCE_RE = re.compile(r"[^.!?]+[.!?]?")


@udtf(returnType="sent_idx int, sentence string, sent_chars int, start_pos int")
class SplitSentences:
    """doc text → (sentence index, trimmed sentence, length, char offset)."""

    def eval(self, text: str) -> Iterator[tuple]:
        if not text:
            return
        idx = 0
        for m in _SENTENCE_RE.finditer(text):
            # explicit ASCII whitespace set: Python's bare strip() also
            # removes \t\n (and unicode spaces) while SQL trim() removes
            # only ' ' — the unicode fuzz variant caught a "\n\t"
            # sentence surviving one engine and not the other
            sent = m.group(0).strip(" \t\n\r\f\v")
            if not sent:
                continue
            yield idx, sent, len(sent), m.start()
            idx += 1


def split_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lateral-join the UDTF against each document row."""
    docs.createOrReplaceTempView("_udtf_docs")
    spark = docs.sparkSession
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        f"""
        SELECT doc_id, s.sent_idx, s.sentence, s.sent_chars, s.start_pos
        FROM _udtf_docs, LATERAL split_sentences({text_col}) AS s
        """
    )


@register(
    "q87_sentence_split_udtf",
    # promoted round 11 from rows-only: the UDTF runs Python, but its
    # splitting rule is a plain regex DuckDB can evaluate identically —
    # so the per-source aggregate IS exactly oracle-checkable (trim +
    # empty-filter semantics mirrored; the avg is one double division
    # in both engines).
    oracle="""
    WITH sents AS (
      -- trim the same explicit ASCII-whitespace set the UDTF strips
      -- (SQL trim() alone removes only ' ')
      SELECT d.doc_id,
             trim(s.sent,
                  ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))
               AS sent
      FROM documents d,
           unnest(regexp_extract_all(d.text, '[^.!?]+[.!?]?')) AS s(sent)
      WHERE trim(s.sent,
                 ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))
              <> ''
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(COUNT(DISTINCT sents.doc_id) AS BIGINT) AS n_docs,
           CAST(MAX(length(sent)) AS INT) AS longest_sentence,
           CAST(SUM(length(sent)) AS DOUBLE) / COUNT(*) AS avg_sentence_len
    FROM sents JOIN documents d2 ON sents.doc_id = d2.doc_id
    GROUP BY source ORDER BY source
    """,
    python_lane=True,  # the UDTF IS the operator under test
)
def q87_sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence stats per source via the UDTF lateral view."""
    docs = load_table(spark, sf_dir, "documents")
    sentences = split_sentences(docs)
    return (
        sentences.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sentences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("sent_chars").alias("longest_sentence"),
            (
                F.sum("sent_chars").cast("double") / F.count("*")
            ).alias("avg_sentence_len"),
        )
        .orderBy("source")
    )


@register(
    "q88_stratified_sample",
    # promoted round 11 from rows-only (verdict r10 item 4): the seeded
    # Bernoulli draws are engine-private, but their CONTRACT is not —
    # the exact stratum sizes are hash-checked cross-engine, the 1.0
    # stratum must keep every row, and each 0.2 stratum's kept fraction
    # must sit within ±0.06 of its target (≥ 5σ of Bernoulli noise at
    # the smallest SF's stratum sizes — a band miss means sampleBy
    # broke, not bad luck).
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS within_tolerance
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q88_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (the reference's M1 downsample,
    src/models/train.py:36-37, on the registry surface): keep all
    'error' events and ~20% of each other type, audited per stratum —
    exact stratum size (oracle-recomputed) plus the kept-fraction
    tolerance verdict."""
    ev = load_table(spark, sf_dir, "events")
    fractions = {
        "error": 1.0,
        "click": 0.2,
        "view": 0.2,
        "purchase": 0.2,
        "signup": 0.2,
    }
    sampled = ev.sampleBy("event_type", fractions=fractions, seed=42)
    kept = sampled.groupBy("event_type").agg(
        F.count("*").alias("_n_sampled")
    )
    totals = ev.groupBy("event_type").agg(F.count("*").alias("n_total"))
    frac_expr = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("event_type")]
    kept_frac = (
        F.coalesce(F.col("_n_sampled"), F.lit(0)).cast("double")
        / F.col("n_total")
    )
    return (
        totals.join(kept, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            # N-AWARE band: ±max(0.06, 5σ of Bernoulli noise at the
            # stratum's actual size) — the fixed 0.06 is ≥5σ only at the
            # committed SFs' stratum sizes; a 12-row stratum (tiny fuzz
            # variant) legitimately deviates by ~0.3 without sampleBy
            # being broken
            F.when(frac_expr >= 1.0, F.col("_n_sampled") == F.col("n_total"))
            .otherwise(
                F.abs(kept_frac - frac_expr)
                <= F.greatest(
                    F.lit(0.06),
                    F.lit(5.0)
                    * F.sqrt(
                        frac_expr * (1.0 - frac_expr)
                        / F.col("n_total")
                    ),
                )
            )
            .alias("within_tolerance"),
        )
        .orderBy("event_type")
    )
