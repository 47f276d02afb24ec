"""Z-order layout: the magic-constant ``zorder64`` key (functions.py) and
the ``write_zordered`` rewrite (io/maintenance.py).

Key correctness: on the 8-bit domain, ``zorder64`` must be bit-identical
to q115's loop-built Morton key (the oracle-checked census) in BOTH
engines — same even/odd bit convention, 5 mask-shift steps instead of
2·bits loop terms.

Layout quality: the point of z-order is that parquet min/max footers
bound BOTH dimensions per file.  We write the same table three ways
(z-ordered, linearly sorted on one column, unsorted-as-is) and assert,
from the real footer statistics, that the z-order layout skips files for
single-column range predicates on EITHER dimension, while the linear
layout cannot skip on the non-sort column."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import zorder64, zorder64_sql
from pyspark_anomaly_detection_spark.io.maintenance import write_zordered
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.relational.analytics_extra import (
    _zorder_spark,
    _zorder_sql,
)


def test_zorder64_matches_q115_loop_key_both_engines(spark):
    pts = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 13)]
    df = spark.createDataFrame(pts, "a long, b long")
    got = df.select(
        "a",
        "b",
        zorder64(F.col("a"), F.col("b")).alias("fast"),
        _zorder_spark(F.col("a"), F.col("b")).alias("loop"),
    ).collect()
    assert all(r.fast == r.loop for r in got)

    # DuckDB twins agree with each other (and hence with Spark)
    n_bad = duckdb.sql(
        f"""
        SELECT count(*) FROM (
          SELECT a, b FROM (SELECT unnest(range(0, 256, 17)) a)
          CROSS JOIN (SELECT unnest(range(0, 256, 13)) b)
        ) WHERE {zorder64_sql('a', 'b')} <> {_zorder_sql('a', 'b')}
        """
    ).fetchone()[0]
    assert n_bad == 0


def _file_ranges(path: str, col_a: str, col_b: str):
    """Per-file (min_a, max_a, min_b, max_b) straight from the parquet
    footers — the statistics a scan's file-skipping actually uses."""
    ds = pq.ParquetDataset(path)
    out = []
    for frag_path in ds.files:
        md = pq.ParquetFile(frag_path).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        lo_a = min(md.row_group(g).column(ia).statistics.min for g in range(md.num_row_groups))
        hi_a = max(md.row_group(g).column(ia).statistics.max for g in range(md.num_row_groups))
        lo_b = min(md.row_group(g).column(ib).statistics.min for g in range(md.num_row_groups))
        hi_b = max(md.row_group(g).column(ib).statistics.max for g in range(md.num_row_groups))
        out.append((lo_a, hi_a, lo_b, hi_b))
    return out


def _files_touched(ranges, dim: int, q_lo, q_hi) -> int:
    """Files whose footer [min,max] on dimension ``dim`` (0=a, 1=b)
    intersects the query range — what predicate pushdown would open."""
    n = 0
    for lo_a, hi_a, lo_b, hi_b in ranges:
        lo, hi = (lo_a, hi_a) if dim == 0 else (lo_b, hi_b)
        if not (hi < q_lo or lo > q_hi):
            n += 1
    return n


@pytest.mark.parametrize("n_files", [8])
def test_write_zordered_skips_on_both_dimensions(spark, sf_dir, tmp_path, n_files):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    row = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
        F.count("*"),
    ).head()
    a_lo, a_hi, b_lo, b_hi, n_rows = row

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(lpath)
    )

    # the rewrite is a layout change only — same rows
    assert spark.read.parquet(zpath).count() == n_rows

    zr = _file_ranges(zpath, "l_partkey", "l_suppkey")
    lr = _file_ranges(lpath, "l_partkey", "l_suppkey")
    assert len(zr) == len(lr) == n_files

    # quarter-domain range queries on each dimension separately
    a_q = (a_lo, a_lo + (a_hi - a_lo) // 4)
    b_q = (b_lo, b_lo + (b_hi - b_lo) // 4)

    # the linear layout bounds only its sort column: a-queries skip,
    # b-queries open every file
    assert _files_touched(lr, 0, *a_q) <= n_files // 2
    assert _files_touched(lr, 1, *b_q) == n_files

    # the z-order layout bounds BOTH: each single-dimension quarter query
    # must skip files, and the combined two-query scan cost beats linear
    z_a, z_b = _files_touched(zr, 0, *a_q), _files_touched(zr, 1, *b_q)
    assert z_a < n_files, f"zorder never skips on dim a: {zr}"
    assert z_b < n_files, f"zorder never skips on dim b: {zr}"
    l_total = _files_touched(lr, 0, *a_q) + _files_touched(lr, 1, *b_q)
    assert z_a + z_b < l_total, (
        f"zorder ({z_a}+{z_b}) not better than linear ({l_total})"
    )


def test_q207_pruning_stats_floor(spark):
    """The pruning measurement behind q207 is quantitatively bounded
    here.  Pinned to sf0.01: at sf0.001 the key domains are so sparse
    (≤375 rows/file at 16 files) that the range partitioner's SAMPLED
    boundaries wobble run-to-run and per-dimension floors flake (q207
    itself drops to 8 fatter files there).  The sampling still moves
    boundaries at sf0.01, so the hard floor is on the BETTER dimension
    and the combined cost; both dimensions must skip at least one
    file."""
    from pyspark_anomaly_detection_spark.io.introspect import (
        zorder_pruning_stats,
    )

    got = {
        (r.layout, r.dimension): r
        for r in zorder_pruning_stats(
            spark, "/root/testdata/sf0.01", n_files=16
        ).collect()
    }
    z_a, z_b = got[("zorder", "l_partkey")], got[("zorder", "l_suppkey")]
    l_a, l_b = got[("linear", "l_partkey")], got[("linear", "l_suppkey")]

    # both dimensions skip, and the better one prunes >=2x
    assert z_a.files_opened < z_a.files_total, z_a
    assert z_b.files_opened < z_b.files_total, z_b
    assert min(z_a.files_opened, z_b.files_opened) * 2 <= z_a.files_total
    # linear bounds only its sort column
    assert l_b.files_opened == l_b.files_total, l_b
    # combined scan cost: z-order strictly beats linear
    assert (
        z_a.files_opened + z_b.files_opened < l_a.files_opened + l_b.files_opened
    )


def test_q207_verdict_bands_all_true(spark):
    """The registered q207 exposes the measurement as five
    sampling-invariant verdict bands, every one TRUE (this is what the
    oracle hash-locks against literal TRUE)."""
    from pyspark_anomaly_detection_spark.io.introspect import (
        q207_zorder_pruning_stats,
    )

    rows = q207_zorder_pruning_stats(spark, "/root/testdata/sf0.001").collect()
    assert [r.check_name for r in rows] == [
        "better_dim_prunes_2x",
        "linear_full_scan_off_dim",
        "linear_skips_sort_dim",
        "zorder_beats_linear_combined",
        "zorder_skips_both_dims",
    ]
    assert all(r.verdict for r in rows), rows


def test_write_zordered_rejects_empty_and_all_null(spark, tmp_path):
    empty = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="empty input or all-null"):
        write_zordered(empty, str(tmp_path / "z1"), "a", "b", 2)
    nulls = spark.createDataFrame([(None, 1), (None, 2)], "a long, b long")
    with pytest.raises(ValueError, match="empty input or all-null"):
        write_zordered(nulls, str(tmp_path / "z2"), "a", "b", 2)
