"""Schema-enforced scans over the testdata star schema and raw CSV feeds.

Scan operators S1-S3 from SURVEY.md §2.1:

* S1 — CSV scan with explicit schema + custom timestamp format
  (reference ``src/data/ingestion.py:69-74``).
* S2 — PERMISSIVE CSV scan with corrupt-record capture
  (reference ``src/data/ingestion_pyspark.py:28-35``).
* S3 — columnar table scan (reference uses Delta ``load``; the testdata is
  plain Parquet — format is pluggable, nothing hard-depends on Delta).

Scale note: all readers return lazy DataFrames; filters/projections composed
on top push down into the Parquet scan (verify with
``df.explain()`` → ``PushedFilters`` / ``ReadSchema``).  The ``events``
table's ns-timestamp normalization is a single exact integer projection that
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyspark_anomaly_detection_spark.io.schemas import (
    CORRUPT_RECORD_COL,
    RAW_TIMESTAMP_FORMAT,
)

#: Tables the driver materializes at each scale factor (TESTDATA.md)
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Defensive, idempotent conf repair for sessions NOT built by our
    ``session.get_spark_session`` (e.g. the driver harness passes its own
    session to ``__spark_entry__.queries()``).  Both confs are runtime-
    settable and parity-critical: without ``nanosAsLong`` the events scan
    throws PARQUET_TYPE_ILLEGAL; without UTC, timestamp formatting drifts
    from the DuckDB oracle."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` arrives in one of two physical forms depending on how the
    driver materialized it, and both are normalized to session-tz TIMESTAMP
    so every downstream operator (``unix_micros``, range frames, window
    specs) sees one type:

    * Parquet ``timestamp[ns]`` — Spark reads it as a nanosecond long under
      ``spark.sql.legacy.parquet.nanosAsLong``; converted with integer
      division (``div 1000`` — exact, truncating), matching DuckDB's ns→µs
      truncation.
    * Parquet ``timestamp[us]`` (isAdjustedToUTC=false) — Spark reads it as
      TIMESTAMP_NTZ; cast to TIMESTAMP, which under the UTC session
      timezone reinterprets the same wall-clock instant exactly (no value
      change), matching DuckDB's naive-timestamp read.
    """
    _ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Normalize every TIMESTAMP_NTZ column (timestamp[us], isAdjustedToUTC
    # =false) to session-tz TIMESTAMP: under the UTC session timezone the
    # cast reinterprets the identical wall-clock instant (no value change),
    # and downstream operators (unix_micros, range frames) require TIMESTAMP.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name, df in load_all_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_csv_enforced(
    spark: SparkSession,
    path: str,
    schema: StructType,
    timestamp_format: str = RAW_TIMESTAMP_FORMAT,
) -> DataFrame:
    """S1: header CSV with an explicit schema — no inference pass.

    Mirrors reference ``src/data/ingestion.py:69-74``.
    """
    return spark.read.csv(
        path, header=True, schema=schema, timestampFormat=timestamp_format
    )


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType,
    timestamp_format: str = RAW_TIMESTAMP_FORMAT,
    corrupt_col: str = CORRUPT_RECORD_COL,
) -> DataFrame:
    """S2: PERMISSIVE CSV scan; malformed rows land in ``corrupt_col``.

    Mirrors reference ``src/data/ingestion_pyspark.py:28-35``.  The schema
    must contain ``corrupt_col`` as a nullable string field.
    """
    return (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("timestampFormat", timestamp_format)
        .schema(schema)
        .csv(path)
    )


def split_quarantine(df: DataFrame, corrupt_col: str = CORRUPT_RECORD_COL) -> tuple[DataFrame, DataFrame]:
    """Q3: split a PERMISSIVE scan into (clean, corrupt) branches.

    Mirrors reference ``src/data/ingestion_pyspark.py:37-44``, minus its
    inefficiency: callers should ``persist()`` the parent before consuming
    both branches (the reference re-scans the CSV up to 4× — SURVEY §4.3).
    """
    corrupt = df.filter(F.col(corrupt_col).isNotNull())
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    return clean, corrupt
