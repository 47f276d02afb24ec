"""PII detection and redaction — the scrubbing pass every production
LLM data pipeline runs before training (emails, phone numbers, IP
addresses → typed placeholder tokens).

Pure JVM regex path: detection is ``regexp_count`` and redaction
``regexp_replace`` with patterns written in the dialect INTERSECTION of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, word boundaries; no lookaround, no backreferences — so the
oracle replays the identical scrub and the redacted-text digests
hash-match.  At 100 TB this is a narrow map-only pass: no shuffle at
all until the optional census aggregate.

The synthetic corpus contains no PII, so the registered query first
INJECTS deterministic PII spans (keyed on doc_id, built with plain
string concat — identical on both engines) into a keyed subset, then
scrubs: the oracle injects and scrubs the same way, and the green hash
proves detection counts, span boundaries, and replacement output
byte-for-byte.  Real corpora skip the injection step and call
:func:`redact_pii` directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: (name, pattern, replacement) — patterns restricted to the Java∩RE2
#: regex dialect.  Order matters: emails first (an email contains no
#: phone/IP match, but scrub order is part of the contract).
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
]


def pii_counts(text: Column) -> list[Column]:
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _repl in PII_RULES
    ]


def redact_pii(text: Column) -> Column:
    """Apply every rule in order; matches of later rules inside earlier
    replacements cannot occur (placeholders contain no digits or @)."""
    out = text
    for _name, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def _inject(text: Column, doc_id: Column) -> Column:
    """Deterministic synthetic PII spans keyed on doc_id (plain concat
    — engine-identical): every 5th doc an email, every 7th a phone,
    every 11th an IP; some docs get several."""
    ids = doc_id.cast("string")
    out = text
    out = F.when(
        doc_id % 5 == 0,
        F.concat(out, F.lit(" contact user"), ids, F.lit("@example.com")),
    ).otherwise(out)
    out = F.when(
        doc_id % 7 == 0,
        F.concat(
            out,
            F.lit(" call 555-010-2"),
            F.lpad((doc_id % 1000).cast("string"), 3, "0"),
        ),
    ).otherwise(out)
    out = F.when(
        doc_id % 11 == 0,
        F.concat(out, F.lit(" from 10.0."), (doc_id % 256).cast("string"),
                 F.lit(".1")),
    ).otherwise(out)
    return out


@register(
    "q225_pii_redaction",
    oracle="""
    WITH injected AS (
      SELECT doc_id, lang,
        text
        || CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN ' call 555-010-2'
                     || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                ELSE '' END
        || CASE WHEN doc_id % 11 = 0
                THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                ELSE '' END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, lang,
        CAST(len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
          AS n_email,
        CAST(len(regexp_extract_all(text,
          '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone,
        CAST(len(regexp_extract_all(text,
          '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
          AS n_ip,
        regexp_replace(
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
              '[EMAIL]', 'g'),
            '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g'),
          '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g')
          AS redacted
      FROM injected
    )
    SELECT doc_id, lang, n_email, n_phone, n_ip,
           sha256(redacted) AS redacted_digest
    FROM scrubbed
    ORDER BY doc_id
    """,
)
def q225_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic PII into the keyed subset, detect per-type
    counts, scrub in rule order, and emit the redacted text's sha256 —
    a green hash proves detection counts, span boundaries, and the
    redacted output byte-for-byte across engines."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        "lang",
        _inject(F.col("text"), F.col("doc_id")).alias("text"),
    )
    return (
        injected.select(
            "doc_id",
            "lang",
            *pii_counts(F.col("text")),
            F.sha2(redact_pii(F.col("text")), 256).alias("redacted_digest"),
        )
        .orderBy("doc_id")
    )
