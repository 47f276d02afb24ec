"""Parquet footer introspection — the lakehouse-ops surface: row-group
layout, compressed sizes, and column counts read from file FOOTERS
(kilobytes) rather than data pages.  This is what compaction planning
(io/maintenance.py::compact_parquet), partition-pruning audits, and
small-file monitoring consume; at a real lake the file list comes from
the catalog/manifest and the footer reads fan out across executors —
exactly the plan here (driver lists the bounded file set, executors
parse footers via pyarrow inside mapInPandas).

Verification has two layers:

* q192 cross-checks the FOOTER-claimed row totals against the engine
  actually scanning the data (DuckDB ``COUNT(*)`` per table) — a green
  hash proves the footer walk reads the real metadata, not a guess.
* q193's richer per-row-group census is rows-only for the driver, but
  tests/test_introspect.py compares it field-by-field against DuckDB's
  independent ``parquet_metadata()`` implementation on the same files —
  two unrelated parquet readers agreeing on binary footers.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import TABLE_NAMES
from pyspark_anomaly_detection_spark.registry import register

_LAYOUT_SCHEMA = (
    "table_name string, file_name string, row_group_id long, n_rows long, "
    "n_columns long, compressed_bytes long, uncompressed_bytes long"
)


def parquet_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (file, row group) across every lake table: row counts
    and byte sizes straight from the parquet footers.  The file listing
    is a bounded driver-side artifact (the catalog's job at scale); the
    footer parsing is distributed."""
    files = [
        (t, os.path.join(sf_dir, f"{t}.parquet"))
        for t in TABLE_NAMES
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        cols = [
            "table_name", "file_name", "row_group_id", "n_rows",
            "n_columns", "compressed_bytes", "uncompressed_bytes",
        ]
        for pdf in batches:
            rows = []
            for table, path in zip(pdf["table_name"], pdf["path"]):
                meta = pq.ParquetFile(path).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    comp = sum(
                        g.column(c).total_compressed_size
                        for c in range(g.num_columns)
                    )
                    uncomp = sum(
                        g.column(c).total_uncompressed_size
                        for c in range(g.num_columns)
                    )
                    rows.append(
                        (
                            table,
                            os.path.basename(path),
                            rg,
                            g.num_rows,
                            g.num_columns,
                            comp,
                            uncomp,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    paths = spark.createDataFrame(files, ["table_name", "path"]).repartition(
        max(1, len(files))
    )
    return paths.mapInPandas(run, schema=_LAYOUT_SCHEMA)


_COUNT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows_total "
    f"FROM {t}"
    for t in TABLE_NAMES
)


@register(
    "q192_footer_row_counts",
    oracle=f"""
    SELECT table_name, n_rows_total FROM ({_COUNT_ORACLE})
    ORDER BY table_name
    """,
)
def q192_footer_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table row totals AS CLAIMED BY THE PARQUET FOOTERS (pyarrow
    metadata walk, distributed) — the oracle recounts every table by
    actually scanning it, so a green hash proves the footer reader
    against ground truth.  This is the integrity check a lake runs
    before trusting footer stats for planning."""
    return (
        parquet_layout(spark, sf_dir)
        .groupBy("table_name")
        .agg(F.sum("n_rows").alias("n_rows_total"))
        .orderBy("table_name")
    )


@register("q193_parquet_layout_census", oracle=None)  # rows-only: footer
# metadata has no view-level SQL twin; tests/test_introspect.py compares
# it against DuckDB's independent parquet_metadata() reader instead.
def q193_parquet_layout_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full row-group layout census: (table, file, row_group, rows,
    columns, compressed/uncompressed bytes) + derived compression ratio
    — the compaction planner's input (small or skewed row groups are
    what compact_parquet exists to fix)."""
    layout = parquet_layout(spark, sf_dir)
    return layout.withColumn(
        "compression_ratio",
        F.round(
            F.col("uncompressed_bytes").cast("double")
            / F.greatest(F.col("compressed_bytes"), F.lit(1)).cast("double"),
            4,
        ),
    ).orderBy("table_name", "file_name", "row_group_id")
