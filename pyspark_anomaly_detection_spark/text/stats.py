"""Text analysis over the ``documents`` table (north-star operators).

Language-ID (stopword heuristic), quality scoring (length / token / stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (min-hash of shingles — a winnowing-style rolling hash).

Everything is built-in Spark SQL functions (split / regexp / higher-order
array lambdas) — no Python UDFs — so the hot path stays inside whole-stage
codegen and scales linearly with document bytes.  Each operator has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_anomaly_detection_spark.functions import (
    MD5_LONG60_SQL,
    md5_long60,
    shingles,
    shingles_sql,
    tokens,
    universal_hash,
    universal_hash_sql,
)
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "que"),
    "de": ("der", "die", "das", "und", "zu"),
}

#: BPE-ish token regex: words, numbers, or single non-space symbols.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def stopword_count(tok: Column, words: tuple[str, ...]) -> Column:
    """# tokens that are stopwords (higher-order filter, JVM-side)."""
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def quality_columns(text: Column) -> list[Column]:
    """Quality-scoring columns: lengths, token stats, ratios."""
    tok = tokens(text)
    n_tok = F.size(tok)
    n_chars = F.length(text)
    stop_en = stopword_count(tok, STOPWORDS["en"])
    return [
        n_chars.alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        F.regexp_count(text, F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
        (n_chars.cast("double") / n_tok).alias("avg_token_len"),
        (stop_en.cast("double") / n_tok).alias("stopword_ratio"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        (F.size(F.array_distinct(tok)).cast("double") / n_tok).alias("lexical_diversity"),
    ]


@register(
    "q28_doc_stats",
    oracle=f"""
    SELECT
      doc_id,
      length(text) AS n_chars_computed,
      len(str_split(text, ' ')) AS n_tokens,
      len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
      CAST(length(text) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
      CAST(len(list_filter(str_split(text, ' '),
        t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
        / len(str_split(text, ' ')) AS stopword_ratio,
      len(list_distinct(str_split(text, ' '))) AS n_distinct_tokens,
      CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
        / len(str_split(text, ' ')) AS lexical_diversity
    FROM documents
    WHERE doc_id % 5 = 0
    ORDER BY doc_id
    """,
    headline=True,
)
def q28_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select("doc_id", *quality_columns(F.col("text"))).orderBy("doc_id")


@register(
    "q29_lang_quality_agg",
    oracle="""
    SELECT
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens,
      CAST(SUM(length(text)) AS DOUBLE) / SUM(len(str_split(text, ' '))) AS chars_per_token,
      CAST(SUM(len(list_distinct(str_split(text, ' ')))) AS BIGINT) AS sum_distinct_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q29_lang_quality_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.size(tok)).alias("total_tokens"),
            (F.sum(F.length("text")).cast("double") / F.sum(F.size(tok))).alias(
                "chars_per_token"
            ),
            F.sum(F.size(F.array_distinct(tok))).alias("sum_distinct_tokens"),
        )
        .orderBy("lang")
    )


def _lang_guess_sql() -> str:
    cases = []
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        cases.append(
            f"len(list_filter(str_split(text, ' '), t -> t IN ({words}))) AS c_{lang}"
        )
    return ", ".join(cases)


@register(
    "q30_lang_id_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT lang, {_lang_guess_sql()} FROM documents
    ),
    guessed AS (
      SELECT lang,
        CASE
          WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
          WHEN c_de >= greatest(c_en, c_es, c_fr) THEN 'de'
          WHEN c_en >= greatest(c_es, c_fr) THEN 'en'
          WHEN c_es >= c_fr THEN 'es'
          ELSE 'fr'
        END AS lang_guess
      FROM scored
    )
    SELECT lang, lang_guess, COUNT(*) AS n_docs
    FROM guessed
    GROUP BY lang, lang_guess
    ORDER BY lang, lang_guess
    """,
)
def q30_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix: labeled ``lang`` vs stopword-heuristic guess.

    Ties resolve to the alphabetically-first language (de > en > es > fr
    priority order in the CASE chain) — encoded identically on both sides.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    c = {lang: stopword_count(tok, words) for lang, words in STOPWORDS.items()}
    guess = (
        F.when(F.greatest(c["de"], c["en"], c["es"], c["fr"]) == 0, F.lit("und"))
        .when(c["de"] >= F.greatest(c["en"], c["es"], c["fr"]), F.lit("de"))
        .when(c["en"] >= F.greatest(c["es"], c["fr"]), F.lit("en"))
        .when(c["es"] >= c["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return (
        docs.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "lang_guess")
    )


#: Quality-filter thresholds (the keep/drop gate of a training-data
#: pipeline; values chosen to split the synthetic corpus non-trivially).
MIN_TOKENS = 8
MIN_LEX_DIVERSITY = 0.5
MAX_STOPWORD_RATIO = 0.4


@register(
    "q85_quality_filter",
    oracle=f"""
    WITH scored AS (
      SELECT
        source,
        len(str_split(text, ' ')) AS n_tokens,
        CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
          / len(str_split(text, ' ')) AS lexical_diversity,
        CAST(len(list_filter(str_split(text, ' '),
          t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
          / len(str_split(text, ' ')) AS stopword_ratio
      FROM documents
    )
    SELECT
      source,
      COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN n_tokens >= {MIN_TOKENS}
               AND lexical_diversity >= {MIN_LEX_DIVERSITY}
               AND stopword_ratio <= {MAX_STOPWORD_RATIO}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN n_tokens < {MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
        AS drop_too_short,
      CAST(SUM(CASE WHEN lexical_diversity < {MIN_LEX_DIVERSITY} THEN 1 ELSE 0 END)
        AS BIGINT) AS drop_low_diversity,
      CAST(SUM(CASE WHEN stopword_ratio > {MAX_STOPWORD_RATIO} THEN 1 ELSE 0 END)
        AS BIGINT) AS drop_stopword_heavy
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def q85_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop quality gate of a training-data pipeline: per source,
    how many documents survive the token-count / lexical-diversity /
    stopword-ratio thresholds and which rule fires on the drops (one pass,
    conditional aggregation — the same violation-counter shape as the DQ
    gates in quality/gates.py)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("source", *quality_columns(F.col("text")))
    keep = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("lexical_diversity") >= MIN_LEX_DIVERSITY)
        & (F.col("stopword_ratio") <= MAX_STOPWORD_RATIO)
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(keep.cast("int")).alias("n_kept"),
            F.sum((F.col("n_tokens") < MIN_TOKENS).cast("int")).alias(
                "drop_too_short"
            ),
            F.sum(
                (F.col("lexical_diversity") < MIN_LEX_DIVERSITY).cast("int")
            ).alias("drop_low_diversity"),
            F.sum(
                (F.col("stopword_ratio") > MAX_STOPWORD_RATIO).cast("int")
            ).alias("drop_stopword_heavy"),
        )
        .orderBy("source")
    )


@register(
    "q86_contamination_check",
    oracle=f"""
    WITH eval_shingles AS (
      SELECT DISTINCT unnest({shingles_sql("str_split(text, chr(32))", 3)}) AS sh
      FROM documents WHERE doc_id < 5
    ),
    corpus AS (
      SELECT doc_id, unnest(list_distinct({shingles_sql("str_split(text, chr(32))", 3)})) AS sh
      FROM documents WHERE doc_id >= 5
    )
    SELECT c.doc_id, COUNT(*) AS n_shared_shingles
    FROM corpus c JOIN eval_shingles e ON c.sh = e.sh
    GROUP BY c.doc_id
    ORDER BY n_shared_shingles DESC, doc_id
    LIMIT 50
    """,
)
def q86_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan: corpus documents sharing 3-gram
    shingles with a (small) eval set.  The eval shingle set is broadcast;
    the corpus side explodes its distinct shingles and hash-joins — at
    100 TB this is a broadcast join against a million-shingle set, no
    corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    eval_sh = (
        docs.filter(F.col("doc_id") < 5)
        .select(tokens(F.col("text")).alias("_tok"))
        .select(F.explode(shingles(F.col("_tok"), 3)).alias("sh"))
        .distinct()
    )
    corpus = (
        docs.filter(F.col("doc_id") >= 5)
        .select("doc_id", tokens(F.col("text")).alias("_tok"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("_tok"), 3))).alias("sh"),
        )
    )
    return (
        corpus.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
        .orderBy(F.desc("n_shared_shingles"), F.asc("doc_id"))
        .limit(50)
    )


@register(
    "q77_keywords_per_lang",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, unnest(str_split(text, ' ')) AS token
      FROM documents
    ),
    totals AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token),
    tf AS (SELECT lang, token, COUNT(*) AS lang_freq FROM tok GROUP BY lang, token),
    scored AS (
      SELECT lang, tf.token, lang_freq, doc_freq,
        CAST(lang_freq * n_docs AS DOUBLE) / doc_freq AS score
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN totals
      WHERE length(tf.token) > 3
    )
    SELECT lang, token, lang_freq, doc_freq, score, rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY score DESC, token) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY lang, rk
    """,
)
def q77_keywords_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive keywords per language: TF-IDF-shaped score computed as
    the exact rational ``lang_freq × n_docs / doc_freq`` (integer products,
    ONE float division — bitwise identical across engines, unlike log-based
    IDF where libm implementations differ in the last ulp).  Presence
    (distinct doc-token) rather than raw counts, stopword-ish tokens
    dropped by length."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    n_docs = docs.count()  # scalar: one tiny job, inlined as a literal
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    tf = tok.groupBy("lang", "token").agg(F.count("*").alias("lang_freq"))
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(df_, "token")
        .filter(F.length("token") > 3)
        .withColumn(
            "score",
            (F.col("lang_freq") * F.lit(n_docs)).cast("double") / F.col("doc_freq"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "token", "lang_freq", "doc_freq", "score", "rk")
        .orderBy("lang", "rk")
    )


@register(
    "q31_doc_fingerprint",
    oracle=f"""
    SELECT
      doc_id,
      list_min(list_transform(
        {shingles_sql("str_split(text, ' ')", 5)},
        s -> {MD5_LONG60_SQL.format(x="s")}
      )) AS fingerprint
    FROM documents
    WHERE doc_id % 7 = 0
    ORDER BY doc_id
    """,
)
def q31_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min 60-bit hash over 5-gram
    shingles — deterministic and engine-independent (md5-based)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    # tokenize once (r16): inline tokens() inside the shingle lambda
    # re-splits the text per window position
    return docs.select("doc_id", tokens(F.col("text")).alias("_tok")).select(
        "doc_id",
        F.array_min(
            F.transform(shingles(F.col("_tok"), 5), md5_long60)
        ).alias("fingerprint"),
    ).orderBy("doc_id")


BPE_WORD = "[A-Za-z]+"
BPE_NUM = "[0-9]+"
BPE_PUNCT = "[^A-Za-z0-9 ]+"


@register(
    "q124_bpe_regex_tokens",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
        len(regexp_extract_all(text, '{BPE_WORD}')) AS n_word,
        len(regexp_extract_all(text, '{BPE_NUM}')) AS n_num,
        len(regexp_extract_all(text, '{BPE_PUNCT}')) AS n_punct
      FROM documents
    )
    SELECT lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_word) AS BIGINT) AS word_tokens,
      CAST(SUM(n_num) AS BIGINT) AS num_tokens,
      CAST(SUM(n_punct) AS BIGINT) AS punct_tokens,
      CAST(CAST(SUM(n_word) AS BIGINT) AS DOUBLE)
        / CAST(CAST(SUM(n_word) AS BIGINT)
               + CAST(SUM(n_num) AS BIGINT)
               + CAST(SUM(n_punct) AS BIGINT) AS DOUBLE) AS word_share
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def q124_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer census with a BPE-style class split (letter runs /
    digit runs / symbol runs — the GPT-2 pre-tokenizer's character-class
    skeleton, kept to classes both regex engines treat identically):
    per-language token-class totals and the word-token share.  This is
    the corpus statistic that sizes a tokenizer vocabulary and flags
    symbol-heavy or numeric-heavy sources before training.  Whitespace
    counting is q41; this is the regex path (one projection with three
    regexp_extract_all, then a map-side-combinable aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    n_word = F.size(F.regexp_extract_all("text", F.lit(BPE_WORD), F.lit(0)))
    n_num = F.size(F.regexp_extract_all("text", F.lit(BPE_NUM), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all("text", F.lit(BPE_PUNCT), F.lit(0)))
    per_doc = docs.select(
        "lang",
        n_word.alias("n_word"),
        n_num.alias("n_num"),
        n_punct.alias("n_punct"),
    )
    sw = F.sum("n_word")
    sn = F.sum("n_num")
    sp = F.sum("n_punct")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            sw.alias("word_tokens"),
            sn.alias("num_tokens"),
            sp.alias("punct_tokens"),
            (
                sw.cast("double") / (sw + sn + sp).cast("double")
            ).alias("word_share"),
        )
        .orderBy("lang")
    )


@register(
    "q139_bigram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bigr AS (
      SELECT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i+1 AS BIGINT)] AS bg
      FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i)
    ),
    dfreq AS (SELECT bg, COUNT(DISTINCT doc_id) AS dfv FROM bigr GROUP BY bg)
    SELECT b.doc_id,
      COUNT(*) AS n_bigrams,
      CAST(SUM(dfv) AS BIGINT) AS sum_doc_freq,
      CAST(SUM(dfv) AS DOUBLE) / COUNT(*) AS mean_doc_freq
    FROM bigr b JOIN dfreq USING (bg)
    GROUP BY b.doc_id ORDER BY doc_id
    """,
)
def q139_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based language-model quality proxy: the corpus bigram table IS
    the model (document frequency per bigram), and each document scores as
    the mean document-frequency of its bigrams — low mean = novel/unusual
    text, high mean = boilerplate.  The count-based formulation keeps the
    score exact-rational (no log-likelihood, so the DuckDB oracle matches
    bitwise) while exercising the real pipeline shape: build n-gram
    statistics over the corpus, join them back to documents, aggregate
    per document.

    Scale: bigram extraction is arrays_zip/slice/explode — pure codegen, no
    Python and no interpreted lambdas.  Two shuffles on the bigram string
    (model build, model join) and one on doc_id; a handful of stop-bigrams
    dominating the join key is the classic AQE-skew-join case, noted for
    cluster deployment."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    pairs = docs.select(
        "doc_id",
        F.explode(F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1))).alias("_p"),
    )
    bigr = pairs.select(
        "doc_id", F.concat_ws(" ", F.col("_p.0"), F.col("_p.1")).alias("bg")
    )
    dfreq = bigr.groupBy("bg").agg(F.countDistinct("doc_id").alias("_df"))
    return (
        bigr.join(dfreq, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("_df").alias("sum_doc_freq"),
            (F.sum("_df").cast("double") / F.count("*")).alias("mean_doc_freq"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------- Count-Min sketch (CMS)

CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row


def cms_sketch(tok_df: DataFrame, col: str = "tok") -> DataFrame:
    """Count-Min sketch of a token stream: ``CMS_D × CMS_W`` counters as a
    (row_id, bucket, cnt) table — ≤ 1024 rows regardless of corpus size.

    Hashes are the same engine-portable md5-based universal family the
    MinHash pipeline uses, so the sketch is bit-identical across engines
    (and across partitionings — counters are additive).  The shuffle
    moves only (row_id, bucket) pairs; the counter table it produces is
    broadcastable state, which is what makes CMS the heavy-hitter
    structure for unbounded streams at 100 TB: merge = elementwise sum.
    """
    base = md5_long60(F.col(col))
    buckets = F.array(
        *[(universal_hash(base, i) % CMS_W).cast("int") for i in range(CMS_D)]
    )
    return (
        tok_df.select(F.posexplode(buckets).alias("row_id", "bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, cands: DataFrame, col: str = "tok") -> DataFrame:
    """Point-estimate candidate tokens against a sketch: rehash each
    candidate, look up its CMS_D counters (broadcast join — the sketch is
    tiny), take the min.  Estimates are guaranteed ≥ the true count."""
    base = md5_long60(F.col(col))
    buckets = F.array(
        *[(universal_hash(base, i) % CMS_W).cast("int") for i in range(CMS_D)]
    )
    keyed = cands.select(
        "*", F.posexplode(buckets).alias("row_id", "bucket")
    )
    return (
        keyed.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy(*cands.columns)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def _cms_oracle() -> str:
    b = MD5_LONG60_SQL.format(x="tok")
    hashed = " UNION ALL ".join(
        f"SELECT tok, {i} AS row_id, CAST({universal_hash_sql(b, i)} % {CMS_W} AS INTEGER) AS bucket FROM tok"
        for i in range(CMS_D)
    )
    cand_h = " UNION ALL ".join(
        f"SELECT tok, exact_cnt, {i} AS row_id, CAST({universal_hash_sql(b, i)} % {CMS_W} AS INTEGER) AS bucket FROM exact"
        for i in range(CMS_D)
    )
    return f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    hashed AS ({hashed}),
    sketch AS (SELECT row_id, bucket, COUNT(*) AS cnt FROM hashed GROUP BY 1, 2),
    exact AS (
      SELECT tok, COUNT(*) AS exact_cnt FROM tok
      GROUP BY tok ORDER BY exact_cnt DESC, tok LIMIT 20
    ),
    cand_h AS ({cand_h}),
    est AS (
      SELECT tok, exact_cnt, MIN(cnt) AS cms_estimate
      FROM cand_h JOIN sketch USING (row_id, bucket) GROUP BY tok, exact_cnt
    )
    SELECT tok,
      CAST(exact_cnt AS BIGINT) AS exact_cnt,
      CAST(cms_estimate AS BIGINT) AS cms_estimate,
      CAST(cms_estimate - exact_cnt AS BIGINT) AS overestimate
    FROM est ORDER BY exact_cnt DESC, tok
    """


@register("q142_cms_heavy_hitters", oracle=_cms_oracle())
def q142_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the corpus token stream, audited
    against exact counts: build the 4×256 sketch, point-estimate the true
    top-20 tokens, report estimate vs exact (overestimate ≥ 0 always;
    bounded by the ε=e/W additive error in expectation).  Unlike the HLL
    pipeline (q99, engine-private binary), every stage here is portable
    SQL, so the whole sketch is oracle-hashed — the mergeability algebra
    (union-of-sketches == sketch-of-union, exactly) is property-tested in
    tests/test_approx_aggregates.py."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    sketch = cms_sketch(tok)
    w = Window.orderBy(F.desc("exact_cnt"), F.asc("tok"))
    exact = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 20)
        .drop("_rk")
    )
    return (
        cms_estimate(sketch, exact)
        .select(
            "tok",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("tok"))
    )


# ------------------------------------------- BPE vocabulary induction (q144)

BPE_MERGES = 8
BPE_EOW = "</w>"


#: Vocabulary size below which BPE merge rounds run in-memory on the
#: driver (the word-freq table IS the training input; real tokenizer
#: trainers are in-memory over exactly this aggregate).  Above it, the
#: distributed per-round path runs.
BPE_DRIVER_VOCAB_LIMIT = 1_000_000


def _bpe_merge_rounds_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """In-memory merge rounds over the collected word-frequency table —
    identical semantics (weighted pair counts, lexicographic tie-break,
    left-to-right non-overlapping merge) to the distributed path, which
    a test asserts by running both."""
    seqs = [(list(w) + [BPE_EOW], f) for w, f in word_freqs]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), pf = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, pf))
        joined = left + right
        for idx, (syms, f) in enumerate(seqs):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[idx] = (out, f)
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = BPE_MERGES,
    driver_vocab_limit: int = BPE_DRIVER_VOCAB_LIMIT,
) -> DataFrame:
    """Byte-pair-encoding tokenizer training, the distributed way: iterate
    ``n_merges`` rounds of (weighted adjacent-pair count → global argmax →
    merge everywhere).

    Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus —
    the aggregation from 100 TB of text down to |vocab| (word, freq) rows
    is the one big shuffle; every merge round then runs over that small
    cached table in a single job.  Pair
    extraction is arrays_zip/slice (codegen); the merge applies a single
    left-to-right non-overlapping fold per word.  Argmax ties break
    lexicographically, so training is deterministic on any partitioning.

    Returns the merge table (rank, left, right, pair_freq) — i.e. the
    learned tokenizer vocabulary in merge order.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        # F.split leaves "" for doubled/leading/trailing separators —
        # drop them HERE so train and encode (which filters `if w`)
        # share one tokenization and encode reproduces trainer state.
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    ).persist()
    # Size the per-round parallelism to the VOCABULARY, not the session
    # default: the merge rounds run ~2 jobs each over |vocab| rows, and a
    # 32-partition shuffle of a 60-row table is pure scheduling overhead
    # (measured 14 s → 4 s at sf0.1).  ~100k words per partition keeps a
    # web-scale vocabulary (10M words) at ~100 partitions.
    n_words = words.count()
    if n_words <= driver_vocab_limit:
        # The corpus → word-frequency aggregation above was the distributed
        # step; the merge rounds themselves fit on the driver (≤ limit
        # rows), where per-round Spark job overhead would dominate by 100×.
        pairs = [(r.w, int(r.freq)) for r in words.collect()]
        words.unpersist()
        from pyspark_anomaly_detection_spark.io.detach import local_rows_df

        return local_rows_df(
            spark,
            _bpe_merge_rounds_local(pairs, n_merges),
            "rank int, left string, right string, pair_freq long",
        )
    n_parts = max(1, n_words // 100_000)
    syms = F.concat(F.split(F.col("w"), "(?!$)"), F.array(F.lit(BPE_EOW)))
    base = words.select("freq", syms.alias("syms")).coalesce(n_parts).persist()
    cur = base
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        n = F.size("syms")
        pairs = (
            cur.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(F.slice("syms", 1, n - 1), F.slice("syms", 2, n - 1))
                ).alias("p"),
            )
            .select("freq", F.col("p.0").alias("l"), F.col("p.1").alias("r"))
        )
        # Global argmax in ONE job: min_by over the struct key
        # (-freq, left, right) realizes "highest freq, lexicographic
        # tie-break" without an orderBy shuffle + take.
        row = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("pf"))
            .agg(
                F.min_by(
                    F.struct("l", "r", "pf"),
                    F.struct((-F.col("pf")).alias("npf"), "l", "r"),
                ).alias("t")
            )
            .first()
        )
        top = row.t if row is not None else None
        if top is None:
            break
        merges.append((rank, top.l, top.r, int(top.pf)))
        a, b = top.l, top.r
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        # No per-round materialization: round r's job replays r folds over
        # the persisted word table — interpreted-lambda cost is linear in
        # rounds but the table is |vocab| rows, so one job per round beats
        # one job per round PLUS a materialization job per round.
        cur = cur.select("freq", merged.alias("syms"))
    words.unpersist()
    base.unpersist()
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    return local_rows_df(
        spark, merges, "rank int, left string, right string, pair_freq long"
    )


@register(
    "q144_bpe_vocab",
    # promoted round 11 from rows-only: the full merge SEQUENCE needs the
    # iterative greedy loop (not SQL), but round 0 is a pure corpus census
    # DuckDB replays exactly — most-frequent adjacent symbol pair over
    # (chars + EOW) weighted by word frequency, ties broken lexicographic
    # on (l, r), the same argmax the trainer's min_by realizes.  The audit
    # hash-checks that first merge's (left, right, pair_freq) cross-engine
    # plus the merge count and a well-formedness verdict (every later
    # merge token decomposes into corpus characters + EOW).  Full merge
    # table remains available via bpe_train; the hand-computed sequence
    # stays pinned in tests.
    oracle=f"""
    WITH words AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(str_split(text, chr(32))) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
    ),
    syms AS (
      SELECT freq,
             list_append(
               list_transform(range(1, length(w) + 1), i -> w[i:i]),
               '{BPE_EOW}'
             ) AS s
      FROM words
    ),
    pair_counts AS (
      SELECT s[i] AS l, s[i + 1] AS r, SUM(freq) AS pf
      FROM syms, unnest(range(1, len(s))) AS t(i)
      GROUP BY l, r
    )
    SELECT CAST({BPE_MERGES} AS BIGINT) AS n_merges,
           l AS first_left,
           r AS first_right,
           CAST(pf AS BIGINT) AS first_pair_freq,
           TRUE AS merges_well_formed
    FROM pair_counts ORDER BY pf DESC, l, r LIMIT 1
    """,
)
def q144_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract audit of BPE vocabulary induction: the round-0 merge
    hash-checked cross-engine, plus count and well-formedness verdicts."""
    from pyspark_anomaly_detection_spark.plans import (
        audit_row,
        audit_row_empty_like,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs).orderBy("rank").collect()  # 8 rows
    if not merges:
        # empty corpus (empty-table fuzz variant): no pairs, no merges —
        # the oracle's `LIMIT 1` over an empty census returns zero rows
        return audit_row_empty_like(
            spark,
            n_merges=0,
            first_left="",
            first_right="",
            first_pair_freq=0,
            merges_well_formed=True,
        )
    first = merges[0]
    # every merge token must decompose into single chars / EOW / earlier
    # merge outputs — the structural invariant of a valid merge table
    produced = set()
    well_formed = True
    for m in merges:
        for side in (m.left, m.right):
            if len(side) > 1 and side != BPE_EOW and side not in produced:
                well_formed = False
        produced.add(m.left + m.right)
    return audit_row(
        spark,
        n_merges=len(merges),
        first_left=first.left,
        first_right=first.right,
        first_pair_freq=int(first.pair_freq),
        merges_well_formed=well_formed,
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge table to a document corpus — the encode
    half of the tokenizer (train = ``bpe_train``): per doc, the exact
    token sequence length the learned vocabulary produces.

    The merge table is tiny (n_merges rows) and is collected + closed
    over — the broadcast-dim pattern; the corpus side runs as ONE
    ``mapInPandas`` pass (Arrow batches, per-batch word memo so repeated
    words encode once).  This is the legitimate pandas-UDF case: BPE's
    greedy merge loop is inherently sequential per word, and real
    tokenizers run exactly this way (CPU-bound token loop over a
    broadcast vocab) on every training-data pipeline.

    Encode semantics mirror the trainer's fold exactly: merges applied
    in rank order, each as a left-to-right non-overlapping replacement —
    so encoding the training corpus reproduces the trainer's final
    symbol state (property-tested).
    """
    merge_list = [
        (r.left, r.right) for r in merges.orderBy("rank").collect()
    ]

    def encode_word(word: str, memo: dict) -> int:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [BPE_EOW]
        for left, right in merge_list:
            out, i = [], 0
            joined = left + right
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = len(syms)
        return len(syms)

    def encode_batches(batches):
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            n_tokens = []
            n_words = []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split(" ") if w]
                n_words.append(len(words))
                n_tokens.append(sum(encode_word(w, memo) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_tokens, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        encode_batches, "doc_id long, n_words long, n_bpe_tokens long"
    )


@register(
    "q165_bpe_encode",
    # promoted round 11 from rows-only: the greedy per-word merge loop is
    # not SQL, but the encode's CONTRACT is — the encoded-doc census and
    # the total word count are hash-checked cross-engine (every doc
    # encoded, the tokenizer's word segmentation reproduced exactly by
    # DuckDB), and the token-count BOUNDS are verdicts: per doc,
    # n_words ≤ n_bpe_tokens ≤ Σ(len(word)+1) — merges only ever shrink
    # the initial chars+EOW symbol count and can never cross a word
    # boundary.  Raw per-doc counts remain available via bpe_encode; the
    # encode==trainer-state property stays pinned in tests.
    oracle="""
    WITH per_doc AS (
      SELECT doc_id,
             len(list_filter(str_split(text, chr(32)), w -> w <> '')) AS nw
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS total_words,
           TRUE AS tokens_lower_bound_ok,
           TRUE AS tokens_upper_bound_ok
    FROM per_doc
    """,
    python_lane=True,  # the mapInPandas merge loop IS the operator under test
)
def q165_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract audit of corpus BPE encoding: exact doc/word censuses
    plus per-doc token-count bound verdicts (see registration comment).

    Trains the 8-merge vocabulary on a deterministic 10% slice (content-
    hash bucket — the standard tokenizer-training practice), then encodes
    EVERY document with it; per-doc counts feed sequence packing (q93)
    and corpus mixing (q137) via :func:`bpe_encode`."""
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    merges = bpe_train(sample)
    encoded = bpe_encode(docs, merges)
    from pyspark_anomaly_detection_spark.functions import tokens

    bounds = docs.select(
        "doc_id",
        F.aggregate(
            F.filter(tokens(F.col("text")), lambda w: w != ""),
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w) + 1,
        ).alias("_max_syms"),
    )
    return (
        encoded.join(bounds, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.min(
                (F.col("n_bpe_tokens") >= F.col("n_words")).cast("int")
            ).alias("_lb"),
            F.min(
                (F.col("n_bpe_tokens") <= F.col("_max_syms")).cast("int")
            ).alias("_ub"),
        )
        .select(
            "n_docs",
            "total_words",
            # coalesce: MIN over zero docs is NULL — the bounds hold
            # vacuously on an empty corpus (empty-table fuzz variant)
            F.coalesce(F.col("_lb") == 1, F.lit(True)).alias(
                "tokens_lower_bound_ok"
            ),
            F.coalesce(F.col("_ub") == 1, F.lit(True)).alias(
                "tokens_upper_bound_ok"
            ),
        )
    )


# ----------------------------------------- compressibility quality (q174)

#: zlib level is pinned so compressed lengths are deterministic for a
#: given zlib build; thresholds below are ratio-based, robust to the
#: ±few-byte variation across zlib versions.
ZLIB_LEVEL = 6

#: compressed/raw below this ⇒ the text is dominated by long-range
#: repetition (boilerplate, template spam) — the flag threshold the
#: Gopher/CCNet-style cleaning stacks apply.
LOW_COMPRESS_RATIO = 0.35


def compressibility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document zlib compression ratio — the long-range-redundancy
    quality signal that token-level repetition (q96) cannot see: a
    document alternating two sentences has near-zero immediate-repeat
    ratio but compresses to almost nothing.

    DEFLATE runs as an Arrow-batched ``mapInPandas`` (C-speed zlib per
    batch, no per-row Python overhead beyond the call); the aggregation
    stays JVM-side.  This is the legitimate pandas path: compression is
    not a relational expression.
    """
    import zlib

    def score(batches):
        import pandas as pd

        for pdf in batches:
            raw, comp = [], []
            for text in pdf[text_col]:
                b = (text or "").encode("utf-8")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, ZLIB_LEVEL)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": pd.Series(raw, dtype="int64"),
                    "comp_len": pd.Series(comp, dtype="int64"),
                }
            )

    out = docs.select("doc_id", text_col).mapInPandas(
        score, "doc_id long, raw_len long, comp_len long"
    )
    return out.withColumn(
        "ratio",
        F.try_divide(F.col("comp_len").cast("double"), F.col("raw_len").cast("double")),
    )


@register(
    "q174_compressibility_quality",
    # promoted round 11 from rows-only: zlib byte counts are not a SQL
    # expression, but the per-source profile's CONTRACT is — the scored-doc
    # census per source is hash-checked cross-engine (every doc must get a
    # ratio: the mapInPandas pass may not drop or duplicate rows), and the
    # ratio invariants (finite, positive, min ≤ mean, boilerplate count a
    # subset of the group) are verdicts DuckDB asserts TRUE per source.
    # Raw ratios remain available via compressibility(); hand-computed
    # ratio values + redundancy monotonicity stay pinned in
    # tests/test_text_quality.py.
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS ratios_positive_finite,
           TRUE AS min_le_mean,
           TRUE AS boilerplate_subset
    FROM documents GROUP BY source ORDER BY source
    """,
    python_lane=True,  # the zlib mapInPandas pass IS the operator under test
)
def q174_compressibility_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compressibility audit: exact scored-doc census plus
    ratio-sanity verdicts (see registration comment)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = compressibility(docs)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("ratio").alias("_mean_ratio"),
            F.min("ratio").alias("_min_ratio"),
            F.sum((F.col("ratio") < LOW_COMPRESS_RATIO).cast("long")).alias(
                "_n_boilerplate"
            ),
        )
        .select(
            "source",
            "n_docs",
            (
                F.col("_min_ratio").isNotNull()
                & (F.col("_min_ratio") > 0.0)
                & ~F.isnan("_mean_ratio")
            ).alias("ratios_positive_finite"),
            (F.col("_min_ratio") <= F.col("_mean_ratio")).alias("min_le_mean"),
            (F.col("_n_boilerplate") <= F.col("n_docs")).alias(
                "boilerplate_subset"
            ),
        )
        .orderBy("source")
    )


#: Per-language quantile gate: drop the bottom quintile by lexical
#: diversity WITHIN each language — absolute thresholds (q85) misfire
#: when languages have different baseline diversity; the quantile form
#: is the per-group calibrated gate a multilingual pipeline needs.
QUANTILE_CUT = 0.2


@register(
    "q197_lang_quality_quantile_gate",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
        CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
          / len(str_split(text, ' ')) AS lexical_diversity
      FROM documents
      WHERE text IS NOT NULL
    ),
    ranked AS (
      SELECT doc_id, lang, lexical_diversity,
             PERCENT_RANK() OVER (
               PARTITION BY lang ORDER BY lexical_diversity, doc_id
             ) AS pr
      FROM scored
    )
    SELECT doc_id, lang, lexical_diversity, pr,
           pr >= {QUANTILE_CUT}
             OR COUNT(*) OVER (PARTITION BY lang) = 1 AS keep
    FROM ranked
    ORDER BY doc_id
    """,
)
def q197_lang_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-quantile gate: percent_rank of lexical
    diversity WITHIN each language (tie-broken by doc_id, so the rank is
    a total order and cross-engine deterministic); keep = not in the
    bottom {QUANTILE_CUT:.0%}.  percent_rank = (rank−1)/(n−1) in both
    engines, an integer-derived division, so the gate is bitwise
    portable — no float-quantile sketch drift.

    Small-group guard: a language with a SINGLE document has
    percent_rank 0.0 by the engines' 0/0 convention, which would always
    drop the lone doc of a rare language regardless of quality — so
    keep is also true when the group size is 1 (both engines).

    Scale shape (round-8 rebase): NO per-language window.  The rank
    comes from text.shards.grouped_percent_rank — a range exchange on
    (lang, diversity, doc_id) + in-partition sorts + a bounded
    per-(partition, lang) offset map — so a dominant language spans
    MANY tasks instead of one single-task multi-terabyte sort.  The
    window form remains as the DuckDB oracle twin; parity is bitwise
    because pr = (rank−1)/(n−1) is an integer-derived IEEE division.
    The approximate alternative (percentile_approx per lang, broadcast
    back) is one aggregate, no sort; this operator is the exact-gate
    leg."""
    # NULL text has no diversity score — excluded EXPLICITLY in both
    # engines (nulls fuzz variant: the engine's rank machinery and the
    # oracle's PERCENT_RANK place nulls differently)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return lang_quantile_gate(docs).orderBy("doc_id")


def lang_quantile_gate(
    docs: DataFrame, cut: float = QUANTILE_CUT, group_col: str = "lang"
) -> DataFrame:
    """The gate stage of q197 on any (doc_id, group, text) frame —
    rank via the scalable grouped ordinal, no per-group window sort;
    lone-doc groups always keep (see q197 docstring)."""
    from pyspark_anomaly_detection_spark.text.shards import (
        grouped_percent_rank,
    )

    tok = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        group_col,
        (F.size(F.array_distinct(tok)).cast("double") / F.size(tok)).alias(
            "lexical_diversity"
        ),
    )
    ranked = grouped_percent_rank(
        scored, group_col, ["lexical_diversity", "doc_id"]
    )
    return ranked.withColumn(
        "keep", (F.col("pr") >= cut) | (F.col("grp_n") == 1)
    ).select("doc_id", group_col, "lexical_diversity", "pr", "keep")
