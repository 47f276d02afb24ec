"""Deterministic dataset splits and group-wise feature normalization —
the reproducibility layer of a training-data pipeline.

Splits are CONTENT-HASH based (md5 of the id, mod 100), not RNG based:
the same document lands in the same split on any engine, any run, any
partitioning, and adding new documents never reshuffles existing ones —
the properties `sample(seed)` cannot give you (its output depends on
partitioning).  Because the hash arithmetic is the portable 60-bit md5
prefix already used for MinHash, the split is DuckDB-expressible and the
whole assignment is oracle-checked, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import (
    MD5_LONG60_SQL,
    fmt_ts,
    md5_long60,
    sum_dbl,
    tokens,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, 100) from the content hash of a key column."""
    return md5_long60(key.cast("string")) % 100


def assign_split(
    df: DataFrame, key_col: str, train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT
) -> DataFrame:
    bucket = split_bucket(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def _split_sql(key_sql: str) -> str:
    bucket = f"({MD5_LONG60_SQL.format(x=key_sql)} % 100)"
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "q91_deterministic_split",
    oracle=f"""
    SELECT
      source,
      {_split_sql("CAST(doc_id AS VARCHAR)")} AS split,
      COUNT(*) AS n_docs,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def q91_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment by content hash — per (source, split)
    counts.  The full assignment (not just counts) is oracle-pinned via
    min_doc_id per cell."""
    docs = assign_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("source", "split")
    )


PACK_BUDGET = 2048
CHUNK_LEN = 500
CHUNK_STRIDE = 400  # 100-char overlap


@register(
    "q93_sequence_packing",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id, len(str_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
        CAST(floor(
          (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
          / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM sized
    )
    SELECT source, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM packed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
)
def q93_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: docs stream in id order per source,
    a pack closes when the running token budget crosses {PACK_BUDGET}.
    pack_id = floor(exclusive-prefix-tokens / budget) — running sums via
    the scalable ``grouped_running_sum`` (range exchange; a dominant
    source spans many partitions) rather than a per-source window whose
    single task would sort that source's whole corpus slice at 100 TB."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = grouped_running_sum(
        sized, "source", ["doc_id"], "n_tokens", out_col="_run"
    ).withColumn(
        "pack_id",
        F.floor((F.col("_run") - F.col("n_tokens")) / float(PACK_BUDGET)),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "pack_id")
    )


@register(
    "q94_doc_chunking",
    oracle=f"""
    WITH chunks AS (
      SELECT
        doc_id,
        CAST(gs AS BIGINT) AS chunk_idx,
        substr(text, CAST(gs * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_LEN}) AS chunk
      FROM documents,
        LATERAL (SELECT unnest(generate_series(
          0, CAST(greatest(ceil((length(text) - {CHUNK_LEN}) / {CHUNK_STRIDE}.0), 0) AS BIGINT)
        )) AS gs)
    )
    SELECT doc_id, chunk_idx, length(chunk) AS chunk_chars,
           substr(chunk, 1, 16) AS chunk_head
    FROM chunks
    WHERE doc_id % 20 = 0
    ORDER BY doc_id, chunk_idx
    """,
)
def q94_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking ({CHUNK_LEN}-char windows,
    {CHUNK_STRIDE}-char stride): sequence → explode → substring, all
    JVM-side — the retrieval-chunking op.  Chunk count per doc =
    ceil((len − width)/stride) + 1 (always ≥ 1)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    n_chunks_minus1 = F.greatest(
        F.ceil((F.length("text") - F.lit(CHUNK_LEN)) / float(CHUNK_STRIDE)),
        F.lit(0),
    ).cast("bigint")
    chunks = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks_minus1)).alias(
            "chunk_idx"
        ),
        "text",
    ).select(
        "doc_id",
        "chunk_idx",
        F.substring(
            F.col("text"), (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("int"), CHUNK_LEN
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").alias("chunk_chars"),
        F.substring("chunk", 1, 16).alias("chunk_head"),
    ).orderBy("doc_id", "chunk_idx")


#: Number-sequence pattern, valid in both Java regex (Spark) and RE2
#: (DuckDB): plain character classes, no lookaround.
REDACT_PATTERN = "[0-9][0-9][0-9]+"
REDACT_TOKEN = "<NUM>"


@register(
    "q95_redaction",
    oracle=f"""
    SELECT
      source,
      CAST(SUM(len(regexp_extract_all(text, '{REDACT_PATTERN}'))) AS BIGINT)
        AS n_redactions,
      CAST(SUM(length(text)) AS BIGINT) AS chars_before,
      CAST(SUM(length(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g')))
        AS BIGINT) AS chars_after,
      CAST(SUM(CASE WHEN regexp_matches(text, '{REDACT_PATTERN}')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q95_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (the PII-scrub shape: sensitive spans → a
    placeholder token): per source, how many spans were redacted and the
    size delta.  Pattern kept to the Java∩RE2 regex subset so the same
    literal runs on both engines; swap in email/phone/ssn patterns for a
    real corpus — the plan is identical."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(
                F.size(F.regexp_extract_all("text", F.lit(REDACT_PATTERN), 0))
            ).alias("n_redactions"),
            F.sum(F.length("text")).alias("chars_before"),
            F.sum(
                F.length(F.regexp_replace("text", REDACT_PATTERN, REDACT_TOKEN))
            ).alias("chars_after"),
            F.sum(F.col("text").rlike(REDACT_PATTERN).cast("int")).alias(
                "n_docs_touched"
            ),
        )
        .orderBy("source")
    )


@register(
    "q96_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk AS token, t.pos
      FROM documents,
        LATERAL (SELECT unnest(str_split(text, ' ')) AS tk,
                        generate_subscripts(str_split(text, ' '), 1) AS pos) t
      WHERE doc_id % 10 = 0
    ),
    runs AS (
      SELECT doc_id,
        CASE WHEN token = LAG(token) OVER (PARTITION BY doc_id ORDER BY pos)
             THEN 1 ELSE 0 END AS is_repeat
      FROM tok
    )
    SELECT doc_id,
      CAST(SUM(is_repeat) AS BIGINT) AS n_immediate_repeats,
      COUNT(*) AS n_tokens,
      CAST(SUM(is_repeat) AS DOUBLE) / COUNT(*) AS repeat_ratio
    FROM runs
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q96_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detector (the degenerate-text filter): per document,
    immediate token-repeat count via posexplode + lag.  At scale this
    runs partitioned by doc — the window key is the doc id, so no
    cross-doc shuffle pressure."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = tok.withColumn(
        "is_repeat",
        (F.col("token") == F.lag("token").over(w)).cast("int"),
    ).fillna(0, subset=["is_repeat"])
    return (
        runs.groupBy("doc_id")
        .agg(
            F.sum("is_repeat").alias("n_immediate_repeats"),
            F.count("*").alias("n_tokens"),
            (F.sum("is_repeat").cast("double") / F.count("*")).alias(
                "repeat_ratio"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q97_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT unnest(str_split(text, ' ')) AS token, doc_id
      FROM documents
    )
    SELECT token,
           COUNT(*) AS doc_freq,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tok
    WHERE length(token) > 6
    GROUP BY token
    HAVING COUNT(*) BETWEEN 2 AND 40
    ORDER BY doc_freq DESC, token
    LIMIT 50
    """,
)
def q97_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the retrieval posting-list op): token →
    sorted doc-id posting list.  Postings are collected as a set, sorted,
    and serialized — order-insensitive to row arrival.  At scale the
    HAVING band drops both hapaxes (index bloat) and stopwords (posting
    lists that are effectively full scans)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"), "doc_id")
        .filter(F.length("token") > 6)
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("doc_freq").between(2, 40))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(50)
    )


@register(
    "q100_training_pipeline",
    headline=True,
    oracle=f"""
    WITH digests AS (
      SELECT doc_id, source, text,
        sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS digest
      FROM documents
    ),
    canonical AS (
      SELECT doc_id, source, text FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rk
        FROM digests
      ) WHERE rk = 1
    ),
    quality AS (
      SELECT doc_id, source, len(str_split(text, ' ')) AS n_tokens
      FROM canonical
      WHERE len(str_split(text, ' ')) >= 8
        AND CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
              / len(str_split(text, ' ')) >= 0.5
        AND CAST(len(list_filter(str_split(text, ' '),
              t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
              / len(str_split(text, ' ')) <= 0.4
    ),
    assigned AS (
      SELECT *, {_split_sql("CAST(doc_id AS VARCHAR)")} AS split FROM quality
    ),
    packed AS (
      SELECT split, doc_id, n_tokens,
        CAST(floor(
          (SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
          / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM assigned
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM packed
    GROUP BY split
    ORDER BY split
    """,
)
def q100_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composite: the LLM training-data pipeline as ONE
    declarative plan — exact dedup (keep min-id per content digest) →
    quality gate (token count / lexical diversity / stopword ratio) →
    deterministic content-hash split → token-budget sequence packing →
    per-split summary.  Every stage is an operator proven individually
    (q32, q85, q91, q93); the oracle checks the composition end-to-end.
    Catalyst pipelines the narrow stages and schedules the digest
    window, the packing range exchange, and the final group-by; the
    packing prefix sum runs on ``grouped_running_sum`` (split has only
    THREE values — a per-split window task would sort a third of the
    post-gate corpus at 100 TB)."""
    from pyspark_anomaly_detection_spark.text.dedup import exact_dedup
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum
    from pyspark_anomaly_detection_spark.text.stats import quality_columns

    docs = load_table(spark, sf_dir, "documents")
    canonical = exact_dedup(docs)
    scored = canonical.select("doc_id", "source", *quality_columns(F.col("text")))
    quality = scored.filter(
        (F.col("n_tokens") >= 8)
        & (F.col("lexical_diversity") >= 0.5)
        & (F.col("stopword_ratio") <= 0.4)
    ).select("doc_id", "source", "n_tokens")
    assigned = assign_split(quality, "doc_id")
    packed = grouped_running_sum(
        assigned, "split", ["doc_id"], "n_tokens", out_col="_run"
    ).withColumn(
        "pack_id",
        F.floor((F.col("_run") - F.col("n_tokens")) / float(PACK_BUDGET)),
    )
    return (
        packed.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


@register(
    "q92_group_normalization",
    oracle="""
    WITH stats AS (
      SELECT
        event_type,
        COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mu,
        sqrt(
          (CAST(COUNT(*) AS DOUBLE)
             * CAST(CAST(SUM(CAST(value AS DECIMAL(19,2))
                              * CAST(value AS DECIMAL(19,2))) AS VARCHAR) AS DOUBLE)
           - CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             * CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE))
          / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))
        ) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           (value - mu) / sigma AS z_value
    FROM events e JOIN stats s ON e.event_type = s.event_type
    ORDER BY event_id
    """,
)
def q92_group_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score feature normalization: group stats from exact
    decimal sums (the q44 variance formula), broadcast back onto the
    rows.  Two passes over events, one tiny broadcast — never a window
    holding the whole group."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count("*").cast("double")
    sx = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    sxx = F.sum(
        F.col("value").cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)")
    ).cast("double")
    stats = ev.groupBy("event_type").agg(
        (sx / n).alias("mu"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))).alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            ((F.col("value") - F.col("mu")) / F.col("sigma")).alias("z_value"),
        )
        .orderBy("event_id")
    )


N_NEGATIVES = 3
NEG_A = 1_566_083_941  # universal-hash multiplier (functions.MINHASH_COEF[1])
NEG_B = 1_013_904_223


@register(
    "q121_negative_sampling",
    oracle=f"""
    WITH numbered AS (
      SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
        COUNT(*) OVER () AS n
      FROM documents
    ),
    cand AS (
      SELECT doc_id AS anchor_id, rn, n, k,
        ((rn * {NEG_A} + k * {NEG_B}) % 2147483647) % n AS partner_rn
      FROM numbered CROSS JOIN (SELECT unnest(range(1, {N_NEGATIVES} + 1)) AS k)
    ),
    pairs AS (
      SELECT c.anchor_id, CAST(c.k AS BIGINT) AS k, p.doc_id AS negative_id
      FROM cand c JOIN numbered p ON c.partner_rn = p.rn
      WHERE c.partner_rn <> c.rn
    )
    SELECT anchor_id, k, negative_id FROM pairs
    ORDER BY anchor_id, k
    """,
)
def q121_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair sampling for contrastive training: each
    anchor doc gets up to {N_NEGATIVES} pseudo-random partners chosen by a
    universal hash of (position, k) — reproducible across runs and
    engines, no rand() seed drift.  Self-pairs are dropped (a hash may
    land on the anchor itself, so k is an attempt index, not a dense
    rank).  Plan shape: distributed global row-numbering via the
    range-exchange + partition-offset machinery (shards.global_row_ids —
    VERDICT r16 item 6: the previous ``ROW_NUMBER() OVER (ORDER BY
    doc_id)`` planned as a SINGLE-partition window sort, a serial
    chokepoint at 100 TB; same total order, no 1-partition Sort), then
    an equi-join back on position; the k expansion is a narrow explode.
    global_row_ids persists its ranged frame internally, so both the
    anchor side and the partner lookup read one cached partitioning
    (the r16 persist's job, now inside the machinery)."""
    from pyspark_anomaly_detection_spark.text.shards import global_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    numbered = (
        global_row_ids(docs, "doc_id")
        .select("doc_id", (F.col("row_id") - 1).alias("rn"))
        .crossJoin(F.broadcast(docs.agg(F.count("*").alias("n"))))
    )
    ks = spark.range(1, N_NEGATIVES + 1).select(F.col("id").alias("k"))
    cand = numbered.crossJoin(F.broadcast(ks)).select(
        F.col("doc_id").alias("anchor_id"),
        "rn",
        "k",
        (
            (F.col("rn").cast("long") * NEG_A + F.col("k") * NEG_B)
            % F.lit(2147483647)
            % F.col("n")
        ).alias("partner_rn"),
    )
    partners = numbered.select(
        F.col("rn").alias("partner_rn"), F.col("doc_id").alias("negative_id")
    )
    return (
        cand.filter(F.col("partner_rn") != F.col("rn"))
        .join(partners, "partner_rn")
        .select("anchor_id", "k", "negative_id")
        .orderBy("anchor_id", "k")
    )


EMBARGO_DAYS = 30
SPLIT_POINT = "2000-01-01 00:00:00"


@register(
    "q122_temporal_embargo_split",
    oracle=f"""
    SELECT
      CASE
        WHEN o_orderdate < TIMESTAMP '{SPLIT_POINT}' - INTERVAL {EMBARGO_DAYS} DAY
          THEN 'train'
        WHEN o_orderdate >= TIMESTAMP '{SPLIT_POINT}' THEN 'test'
        ELSE 'embargo'
      END AS split,
      COUNT(*) AS n_orders,
      strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS first_date,
      strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS last_date
    FROM orders
    GROUP BY split
    ORDER BY split
    """,
)
def q122_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe chronological split: train ends an EMBARGO_DAYS gap
    before the test boundary, so features computed with trailing windows
    (q21's 1h/24h frames) cannot straddle the cut — the reference's
    chronological split (src/data/silver.py:44-49) hardened for windowed
    features.  Embargoed rows are reported, not silently dropped."""
    split_ts = F.lit(SPLIT_POINT).cast("timestamp")
    embargo_start = split_ts - F.expr(f"INTERVAL {EMBARGO_DAYS} DAYS")
    ord_ = load_table(spark, sf_dir, "orders")
    return (
        ord_.withColumn(
            "split",
            F.when(F.col("o_orderdate") < embargo_start, "train")
            .when(F.col("o_orderdate") >= split_ts, "test")
            .otherwise("embargo"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_orders"),
            fmt_ts(F.min("o_orderdate")).alias("first_date"),
            fmt_ts(F.max("o_orderdate")).alias("last_date"),
        )
        .orderBy("split")
    )


N_FOLDS = 4
FOLD_TRAIN_DAYS = 365
FOLD_TEST_DAYS = 90
FOLD_ORIGIN = "1996-01-01 00:00:00"


@register(
    "q128_walk_forward_folds",
    oracle=f"""
    WITH folds AS (
      SELECT unnest(range({N_FOLDS})) AS fold
    ),
    bounds AS (
      SELECT fold,
        TIMESTAMP '{FOLD_ORIGIN}' + fold * INTERVAL {FOLD_TEST_DAYS} DAY AS train_start,
        TIMESTAMP '{FOLD_ORIGIN}' + fold * INTERVAL {FOLD_TEST_DAYS} DAY
          + INTERVAL {FOLD_TRAIN_DAYS} DAY AS test_start,
        TIMESTAMP '{FOLD_ORIGIN}' + fold * INTERVAL {FOLD_TEST_DAYS} DAY
          + INTERVAL {FOLD_TRAIN_DAYS + FOLD_TEST_DAYS} DAY AS test_end
      FROM folds
    )
    SELECT CAST(b.fold AS BIGINT) AS fold,
      COUNT(CASE WHEN o_orderdate >= train_start AND o_orderdate < test_start
                 THEN 1 END) AS n_train,
      COUNT(CASE WHEN o_orderdate >= test_start AND o_orderdate < test_end
                 THEN 1 END) AS n_test
    FROM orders CROSS JOIN bounds b
    GROUP BY b.fold
    ORDER BY fold
    """,
)
def q128_walk_forward_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtesting folds: k chronologically-rolling
    (train-window, test-window) pairs stepped by the test width — the
    model-validation protocol for temporal data, where k-fold shuffling
    would leak the future into training.  The fold spec is a tiny
    broadcast cross join; fold membership is a per-row conditional, so
    the fact table is scanned once for all folds (not once per fold)."""
    folds = spark.range(N_FOLDS).select(F.col("id").alias("fold"))
    origin = F.lit(FOLD_ORIGIN).cast("timestamp")
    step = F.col("fold") * F.expr(f"INTERVAL {FOLD_TEST_DAYS} DAYS")
    bounds = folds.select(
        "fold",
        (origin + step).alias("train_start"),
        (origin + step + F.expr(f"INTERVAL {FOLD_TRAIN_DAYS} DAYS")).alias(
            "test_start"
        ),
        (
            origin + step + F.expr(f"INTERVAL {FOLD_TRAIN_DAYS + FOLD_TEST_DAYS} DAYS")
        ).alias("test_end"),
    )
    ord_ = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        ord_.crossJoin(F.broadcast(bounds))
        .groupBy("fold")
        .agg(
            F.count(
                F.when((d >= F.col("train_start")) & (d < F.col("test_start")), 1)
            ).alias("n_train"),
            F.count(
                F.when((d >= F.col("test_start")) & (d < F.col("test_end")), 1)
            ).alias("n_test"),
        )
        .orderBy("fold")
    )


@register(
    "q129_class_rebalance",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    mx AS (SELECT MAX(n) AS target FROM counts),
    factors AS (
      SELECT lang, n, CAST(ceil(CAST(target AS DOUBLE) / n) AS BIGINT) AS rep
      FROM counts, mx
    ),
    replicated AS (
      SELECT d.lang, d.doc_id
      FROM documents d
      JOIN factors f ON d.lang = f.lang
      CROSS JOIN LATERAL (SELECT unnest(range(f.rep)) AS copy_i) c
    )
    SELECT r.lang,
      CAST(f.n AS BIGINT) AS n_before,
      COUNT(*) AS n_after,
      CAST(f.rep AS BIGINT) AS rep_factor
    FROM replicated r JOIN factors f ON r.lang = f.lang
    GROUP BY r.lang, f.n, f.rep
    ORDER BY r.lang
    """,
)
def q129_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic minority-class upsampling: every language class is
    integer-replicated (ceil(max/n) copies via array_repeat + explode) to
    at least the majority-class count — the reproducible alternative to
    seeded random oversampling (``sampleBy`` with fraction>1 is
    nondeterministic across engines; integer replication is exact).  The
    per-class factors are a broadcast; replication is a narrow explode, so
    nothing shuffles except the final per-class count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    target = counts.agg(F.max("n").alias("target"))
    factors = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        "n",
        F.ceil(F.col("target").cast("double") / F.col("n")).cast("long").alias("rep"),
    )
    replicated = (
        docs.join(F.broadcast(factors), "lang")
        .withColumn("copy_i", F.explode(F.array_repeat(F.lit(1), F.col("rep").cast("int"))))
    )
    return (
        replicated.groupBy("lang", "n", "rep")
        .agg(F.count("*").alias("n_after"))
        .select(
            "lang",
            F.col("n").alias("n_before"),
            "n_after",
            F.col("rep").alias("rep_factor"),
        )
        .orderBy("lang")
    )


# Target corpus mix: source -> share of the final training blend.
MIX_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIX_TOTAL_DOCS = 120  # requested blend size at any SF (quota-capped)


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {share!r}" for s, share in MIX_TARGETS.items()
    )
    return f"(CASE source {whens} ELSE 0.0 END)"


@register(
    "q137_training_mix",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
        ROW_NUMBER() OVER (
          PARTITION BY source
          ORDER BY {MD5_LONG60_SQL.format(x="CAST(doc_id AS VARCHAR)")}, doc_id
        ) AS rk,
        COUNT(*) OVER (PARTITION BY source) AS avail
      FROM documents
    ),
    quota AS (
      SELECT *,
        LEAST(avail, CAST(floor({MIX_TOTAL_DOCS} * {_mix_case_sql()}) AS BIGINT))
          AS take
      FROM ranked
    ),
    chosen AS (
      SELECT doc_id, source FROM quota WHERE rk <= take
    )
    SELECT source, COUNT(*) AS n_sampled,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM chosen
    GROUP BY source
    ORDER BY source
    """,
)
def q137_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: sample each source down to its share of a target
    blend (src0 50% / src1 30% / src2 20%; swap real source names in
    production) with a DETERMINISTIC pseudo-
    random pick — rows ranked by content hash inside each source, take
    the first quota.  Same properties as the split assignment (engine-
    and partitioning-independent, stable under corpus growth for already-
    chosen ranks); rand(seed) can't give any of that.  Ranks come from
    the scalable ``grouped_row_ids`` (range exchange on (source, hash);
    a dominant source spans many partitions instead of one giant
    per-source window sort)."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    share = F.lit(0.0)
    for s, p in MIX_TARGETS.items():
        share = F.when(F.col("source") == s, F.lit(p)).otherwise(share)
    ranked = grouped_row_ids(
        docs,
        "source",
        [md5_long60(F.col("doc_id").cast("string")), F.col("doc_id")],
        ordinal_col="rk",
        total_col="avail",
    ).withColumn(
        "take",
        F.least(
            F.col("avail"),
            F.floor(F.lit(MIX_TOTAL_DOCS) * share).cast("bigint"),
        ),
    )
    chosen = ranked.filter(F.col("rk") <= F.col("take"))
    return (
        chosen.groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------- curriculum deciles (q175)


@register(
    "q175_curriculum_deciles",
    oracle="""
    WITH scored AS (
      SELECT
        source, doc_id,
        len(str_split(text, ' ')) AS n_tokens,
        len(list_distinct(str_split(text, ' '))) AS difficulty
      FROM documents
      WHERE text IS NOT NULL
    ),
    staged AS (
      SELECT source, doc_id, n_tokens, difficulty,
             NTILE(10) OVER (PARTITION BY source
                             ORDER BY difficulty, doc_id) AS decile
      FROM scored
    )
    SELECT
      source, decile,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(MIN(difficulty) AS BIGINT) AS min_difficulty,
      CAST(MAX(difficulty) AS BIGINT) AS max_difficulty
    FROM staged
    GROUP BY source, decile
    ORDER BY source, decile
    """,
)
def q175_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering manifest: documents ranked easy→hard per source
    (difficulty proxy = distinct-token count, an exact integer so both
    engines order identically; ties by doc_id) and bucketed into deciles —
    the stage table a curriculum sampler walks from decile 1 upward.

    Scale shape (round-8 rebase): NO per-source NTILE window (one
    post-shuffle partition per source = a single-task sort for a
    dominant source at 100 TB).  The decile comes from
    text.shards.grouped_ntile: a range exchange on (source, difficulty,
    doc_id) so one source spans many tasks, then NTILE's closed form on
    (rank within group, group size) — bitwise-identical to the window
    form (the DuckDB oracle keeps NTILE as the exact twin)."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_ntile

    # NULL text has no difficulty — excluded EXPLICITLY in both engines
    # (ranking nulls is engine-dependent; nulls fuzz variant)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = tokens(F.col("text"))
    scored = docs.select(
        "source",
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("difficulty"),
    )
    return (
        grouped_ntile(
            scored, "source", ["difficulty", "doc_id"], 10, out_col="decile"
        )
        .groupBy("source", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("difficulty").alias("min_difficulty"),
            F.max("difficulty").alias("max_difficulty"),
        )
        .orderBy("source", "decile")
    )


# --------------------------------------- weighted sampling (q180/q181)

#: Sample size for the weighted corpus draw.
WSAMPLE_K = 40

#: Per-source token budget (chars stand in for tokens in the testdata)
#: for the quality-budget selection.
QBUDGET_CHARS = 2_000


@register(
    "q180_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
        CAST(floor(power(
          (CAST({MD5_LONG60_SQL.format(x="CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1.0)
            / 1152921504606846977.0,
          1.0 / CAST(greatest(n_chars, 1) AS DOUBLE)
        ) * 1000000000000.0) AS BIGINT) AS es_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS rank
      FROM keyed
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, source,
           CAST(n_chars AS BIGINT) AS weight
    FROM ranked WHERE rank <= {WSAMPLE_K}
    ORDER BY rank
    """,
)
def q180_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis, public): per row draw u ∈ (0,1] from the
    portable md5 hash (not a seeded RNG — same rows selected on any
    engine/partitioning), key = u^(1/weight), keep the top-K keys.
    Inclusion probability rises with weight (n_chars here — longer docs
    stand in for higher-value docs), which uniform hash-rank sampling
    (q137) cannot express.  One global top-K — TakeOrderedAndProject,
    no full sort; weights shuffle, text does not."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = (md5_long60(F.col("doc_id").cast("string")).cast("double") + 1.0) / F.lit(
        float((1 << 60) + 1)
    )
    # INTEGER-domain key: floor(pow·1e12) as BIGINT.  Java Math.pow and
    # DuckDB's libm power can differ in the last ULPs, and the engines'
    # round() functions differ in KIND (Spark: BigDecimal HALF_UP;
    # DuckDB: float rounding), so a fractional key can order differently
    # per engine near the top-K cutoff.  IEEE double multiply + floor is
    # bit-identical on both engines given the same pow result, leaving
    # only the (fixed-testdata-safe) pow-ULP-at-bin-edge case; ties
    # within a 1e-12 bin break by doc_id identically on both sides.
    key = F.floor(
        F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"))
        * F.lit(1e12)
    )
    # distributed top-K FIRST (orderBy+limit → TakeOrderedAndProject, no
    # global single-task sort), THEN rank the K survivors — the global
    # row_number window only ever sees K rows.
    topk = docs.withColumn("es_key", key).orderBy(
        F.desc("es_key"), F.asc("doc_id")
    ).limit(WSAMPLE_K)
    w = Window.orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
        )
        .orderBy("rank")
    )


@register(
    "q181_quality_budget_selection",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
          / greatest(length(text), 1) AS q_score
      FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_chars, q_score,
        SUM(n_chars) OVER (
          PARTITION BY source ORDER BY q_score DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum_chars
      FROM scored
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_selected,
      CAST(SUM(n_chars) AS BIGINT) AS chars_used,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM cum WHERE cum_chars <= {QBUDGET_CHARS}
    GROUP BY source ORDER BY source
    """,
)
def q181_quality_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-budget curation: order each source's docs by a
    quality score (token density — tokens per char), admit greedily
    until the source's char budget is filled (window cumulative sum ≤
    budget).  The nucleus-style counterpart of q137's fixed-share mix:
    budget allocated to the BEST docs of each source rather than a
    uniform draw.  The cumsum runs on ``grouped_running_sum`` (range
    exchange on (source, score desc) — a dominant source spans many
    partitions instead of one giant per-source window task)."""
    from pyspark_anomaly_detection_spark.text.shards import grouped_running_sum

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    scored = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (
            n_tokens.cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("q_score"),
    )
    return (
        grouped_running_sum(
            scored,
            "source",
            [F.desc("q_score"), F.asc("doc_id")],
            "n_chars",
            out_col="cum_chars",
        )
        .filter(F.col("cum_chars") <= QBUDGET_CHARS)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_selected"),
            F.sum("n_chars").cast("long").alias("chars_used"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )
