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
    python_lane=True,
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


_META_UNION = "\n      UNION ALL\n".join(
    f"""      SELECT '{t}' AS table_name, file_name, row_group_id,
             row_group_num_rows, total_compressed_size,
             total_uncompressed_size
      FROM parquet_metadata('{{SF_DIR}}/{t}.parquet')"""
    for t in TABLE_NAMES
)


@register(
    "q193_parquet_layout_census",
    python_lane=True,
    # promoted round 8 from rows-only: DuckDB's INDEPENDENT
    # parquet_metadata() table function over the SAME binary files is the
    # oracle — two unrelated parquet footer readers hash-matching.  The
    # {SF_DIR} token binds to the run's data dir (registry.resolve_oracle;
    # the driver's correctness gate runs at its sf0.01 default).
    oracle=f"""
    WITH m AS (
{_META_UNION}
    ),
    g AS (
      SELECT table_name,
             regexp_extract(file_name, '[^/\\\\]+$') AS file_name,
             row_group_id,
             CAST(MIN(row_group_num_rows) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_columns,
             CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
             CAST(SUM(total_uncompressed_size) AS BIGINT)
               AS uncompressed_bytes
      FROM m GROUP BY 1, 2, 3
    )
    SELECT table_name, file_name, row_group_id, n_rows, n_columns,
           compressed_bytes, uncompressed_bytes,
           CAST(uncompressed_bytes AS DOUBLE)
             / CAST(greatest(compressed_bytes, 1) AS DOUBLE)
             AS compression_ratio
    FROM g
    ORDER BY table_name, file_name, row_group_id
    """,
)
def q193_parquet_layout_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full row-group layout census: (table, file, row_group, rows,
    columns, compressed/uncompressed bytes) + derived compression ratio
    — the compaction planner's input (small or skewed row groups are
    what compact_parquet exists to fix).  The ratio is a plain IEEE
    division of footer integers (no rounding) so both engines produce
    the identical double."""
    layout = parquet_layout(spark, sf_dir)
    return layout.withColumn(
        "compression_ratio",
        F.col("uncompressed_bytes").cast("double")
        / F.greatest(F.col("compressed_bytes"), F.lit(1)).cast("double"),
    ).orderBy("table_name", "file_name", "row_group_id")
