"""Parquet footer introspection tests (io/introspect.py): the pyarrow
footer walk cross-checked against DuckDB's INDEPENDENT
``parquet_metadata()`` reader on the same binary files — two unrelated
parquet implementations agreeing field-by-field is the rows-only q193's
stand-in for a SQL oracle.
"""

from __future__ import annotations

from pyspark_anomaly_detection_spark.io.introspect import parquet_layout
from pyspark_anomaly_detection_spark.io.readers import TABLE_NAMES


def test_layout_matches_duckdb_parquet_metadata(spark, duck, sf_dir):
    got = {
        (r.table_name, r.row_group_id): r
        for r in parquet_layout(spark, sf_dir).collect()
    }
    assert got, "no layout rows"
    n_checked = 0
    for t in TABLE_NAMES:
        rows = duck.execute(
            f"""
            SELECT row_group_id,
                   MIN(row_group_num_rows) AS n_rows,
                   COUNT(*) AS n_columns,
                   SUM(total_compressed_size) AS comp,
                   SUM(total_uncompressed_size) AS uncomp
            FROM parquet_metadata('{sf_dir}/{t}.parquet')
            GROUP BY row_group_id
            """
        ).fetchall()
        for rg_id, n_rows, n_cols, comp, uncomp in rows:
            r = got[(t, rg_id)]
            assert r.n_rows == n_rows, (t, rg_id)
            assert r.n_columns == n_cols, (t, rg_id)
            assert r.compressed_bytes == comp, (t, rg_id)
            assert r.uncompressed_bytes == uncomp, (t, rg_id)
            n_checked += 1
    assert n_checked == len(got), "pyarrow saw row groups DuckDB did not"


def test_footer_counts_equal_scan_counts(spark, duck, sf_dir):
    """q192's invariant stated directly: footer-claimed totals == actual
    scan counts for every table."""
    from pyspark_anomaly_detection_spark.io.introspect import (
        q192_footer_row_counts,
    )

    got = {
        r.table_name: r.n_rows_total
        for r in q192_footer_row_counts(spark, sf_dir).collect()
    }
    for t in TABLE_NAMES:
        (n,) = duck.execute(f"SELECT COUNT(*) FROM {t}").fetchone()
        assert got[t] == n, t
