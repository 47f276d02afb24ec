"""Partitioned columnar sinks (SURVEY.md §2.1 S4-S8).

The reference writes Delta everywhere (``src/data/ingestion_pyspark.py:53-59``,
``src/data/silver.py:56-59``, ``src/data/gold.py:57-60``); this engine makes
the format pluggable (Parquet default — the delta-spark jars are not baked
into this environment) so nothing hard-depends on Delta.  Partition columns
give hive-style layouts that Catalyst prunes automatically at read time.

Scale note: partition by low-cardinality derived date columns (the
reference's ``ingestion_date`` / ``year,month`` pattern) — never by
high-cardinality keys, which would create millions of tiny files at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """S5/S8: plain sink (append quarantine / overwrite gold).

    ``fmt='deltalite'`` routes through the jar-free Delta-protocol
    writer (io/deltalite.py) — the reference's silver/gold tables are
    Delta (src/data/silver.py:56-59); with this format the medallion
    stages gain transactional overwrites, history, and time travel.
    Read such tables back with ``deltalite.read_delta``, not a plain
    parquet read (data files live in commit subdirectories)."""
    if fmt == "deltalite":
        from pyspark_anomaly_detection_spark.io.deltalite import write_delta

        write_delta(
            df, path, mode="append" if mode == "append" else "overwrite"
        )
        return
    writer = df.write.format(fmt).mode(mode)
    for key, value in (options or {}).items():
        writer = writer.option(key, value)
    writer.save(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Incremental partition upsert: overwrite ONLY the partitions present
    in ``df``, leaving every other partition untouched.

    The nightly-pipeline write pattern at 100 TB: re-materializing one
    day's partition must not rewrite (or delete) the other 3 years of
    history — static overwrite mode would.  Uses Spark's dynamic
    partition-overwrite mode, scoped to this one write.
    """
    (
        df.write.format(fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) catalog table — the co-located-join layout.

    Two tables bucketed on their join key with the SAME bucket count join
    with ZERO shuffle: each bucket pair is joined in place (verified by
    plan assertion in tests — no ``Exchange hashpartitioning`` on either
    side).  At 100 TB this converts the nightly fact-fact join from a full
    2-sided shuffle into a per-bucket sort-merge; ``sort_by`` additionally
    pre-orders within buckets so even the sort is free at read time.

    Bucketed tables must go through the catalog (``saveAsTable``) — the
    bucket metadata lives there, not in the files.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """S4/S6/S7: hive-partitioned overwrite sink.

    Mirrors reference ``src/data/ingestion.py:85`` (``partitionBy("year",
    "month")``) and ``src/data/ingestion_pyspark.py:53-59``
    (``partitionBy("ingestion_date")``).
    """
    writer = df.write.format(fmt).mode(mode).partitionBy(*partition_by)
    for key, value in (options or {}).items():
        writer = writer.option(key, value)
    writer.save(path)
