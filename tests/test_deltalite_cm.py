"""Column mapping ('name' mode): physical/logical decoupling, rename as
metadata-only commit, time travel across renames, append round-trips,
and the fail-loud guards on untaught surfaces."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    read_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_cm import (
    physical_name,
    rename_column_mapped,
    write_delta_mapped,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1)
    )


def _physical_columns(t):
    import pyarrow.parquet as pq

    files = []
    for root, _dirs, names in os.walk(t):
        if "_delta_log" in root:
            continue
        files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    cols = set()
    for f in files:
        cols.update(pq.ParquetFile(f).schema_arrow.names)
    return cols


def test_mapped_write_stores_physical_reads_logical(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)
    # files carry content-addressed physical names, never logical ones
    phys = _physical_columns(t)
    assert phys == {physical_name("id"), physical_name("v")}
    assert "id" not in phys
    out = read_delta(spark, t)
    assert out.columns == ["id", "v"]
    assert sorted((r.id, r.v) for r in out.collect()) == [
        (i, 2 * i) for i in range(10)
    ]


def test_mapped_append_and_overwrite(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)
    write_delta_mapped(_df(spark, 5, 8), t, mode="append")
    assert read_delta(spark, t).count() == 8
    write_delta_mapped(_df(spark, 100, 102), t, mode="overwrite")
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [100, 101]
    # schema mismatch refuses
    with pytest.raises(ValueError, match="logical schema"):
        write_delta_mapped(
            spark.range(3).select(F.col("id")), t, mode="append"
        )


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 6), t)  # v0
    before = _physical_columns(t)
    v1 = rename_column_mapped(t, "v", "value")  # v1: metadata only
    assert _physical_columns(t) == before  # zero data files touched
    now = read_delta(spark, t)
    assert now.columns == ["id", "value"]
    assert sorted(r.value for r in now.collect()) == [2 * i for i in range(6)]
    # pre-rename version still reads under the OLD logical name
    old = read_delta(spark, t, version=v1 - 1)
    assert old.columns == ["id", "v"]
    # rename guards
    with pytest.raises(ValueError, match="no such column"):
        rename_column_mapped(t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column_mapped(t, "id", "value")


def test_unmapped_table_rejects_rename(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 3), t)
    with pytest.raises(ValueError, match="column-mapped"):
        rename_column_mapped(t, "v", "value")


def test_mapped_partitioned_lifecycle(spark, tmp_path):
    """Column mapping × partitioned tables (round 14 — the last CM
    composition edge): hive dirs and partitionValues keys are PHYSICAL
    names, partitionColumns stays logical, and write / append / pruned
    read / COW DML / time travel all translate."""
    from pyspark_anomaly_detection_spark.io import deltalite
    from pyspark_anomaly_detection_spark.io.deltalite_dml import (
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    df = spark.range(0, 8).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 2).cast("string").alias("side"),
    )
    write_delta_mapped(df, t, partition_by=["side"])
    write_delta_mapped(
        spark.range(8, 12).select(
            F.col("id"),
            (F.col("id") * 2).alias("v"),
            (F.col("id") % 2).cast("string").alias("side"),
        ),
        t,
        mode="append",
    )
    snap = deltalite._snapshot_state(t)
    assert snap.part_cols == ["side"]  # logical in metaData
    phys_side = physical_name("side")
    assert all(
        set(a["partitionValues"]) == {phys_side}
        for a in snap.adds.values()
    )  # physical keys in the log, per the protocol's CM rule
    rows = {r.id: (r.side, r.v) for r in read_delta(spark, t).collect()}
    assert sorted(rows) == list(range(12))
    assert all(rows[i][0] == str(i % 2) for i in rows)
    # log-level pruning by LOGICAL name
    pruned = read_delta(spark, t, partition_filter={"side": "1"})
    assert sorted(r.id for r in pruned.collect()) == [
        i for i in range(12) if i % 2 == 1
    ]
    # COW DML with logical predicates
    delete_delta(spark, t, "id % 3 = 0")
    update_delta(spark, t, "id % 5 = 1", {"v": "v + 100"})
    rows = {r.id: (r.side, r.v) for r in read_delta(spark, t).collect()}
    assert sorted(rows) == [i for i in range(12) if i % 3 != 0]
    for i, (side, v) in rows.items():
        assert side == str(i % 2)
        assert v == i * 2 + (100 if i % 5 == 1 else 0)
    # time travel still reconstructs partition columns
    assert read_delta(spark, t, version=1).count() == 12


def test_mapped_partitioned_rename_partition_column(spark, tmp_path):
    """Renaming a partition column is metadata-only: partitionColumns
    rebinds to the new logical name while hive dirs / partitionValues
    stay put under the stable physical name."""
    from pyspark_anomaly_detection_spark.io import deltalite

    t = str(tmp_path / "t")
    df = spark.range(0, 6).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("side")
    )
    write_delta_mapped(df, t, partition_by=["side"])
    rename_column_mapped(t, "side", "bucket")
    snap = deltalite._snapshot_state(t)
    assert snap.part_cols == ["bucket"]
    rows = {r.id: r.bucket for r in read_delta(spark, t).collect()}
    assert all(rows[i] == str(i % 2) for i in rows)
    pruned = read_delta(spark, t, partition_filter={"bucket": "0"})
    assert sorted(r.id for r in pruned.collect()) == [0, 2, 4]


def test_mapped_partitioned_merge_and_optimize(spark, tmp_path):
    """MERGE (insert branch lands in physical hive dirs) and per-group
    OPTIMIZE both translate on a mapped partitioned table."""
    from pyspark_anomaly_detection_spark.io import deltalite
    from pyspark_anomaly_detection_spark.io.deltalite import optimize_delta
    from pyspark_anomaly_detection_spark.io.deltalite_dml import merge_delta

    t = str(tmp_path / "t")
    df = spark.range(0, 8).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 2).cast("string").alias("side"),
    )
    write_delta_mapped(df, t, partition_by=["side"])
    src = spark.createDataFrame(
        [(3, 333, "1"), (20, 2020, "0")], "id long, v long, side string"
    )
    out = merge_delta(spark, t, src, key="id")
    assert out["rows_matched"] == 1 and out["rows_inserted"] == 1
    optimize_delta(spark, t)
    snap = deltalite._snapshot_state(t)
    phys_side = physical_name("side")
    assert all(
        set(a["partitionValues"]) == {phys_side}
        for a in snap.adds.values()
    )
    rows = {r.id: (r.side, r.v) for r in read_delta(spark, t).collect()}
    assert sorted(rows) == list(range(8)) + [20]
    assert rows[3] == ("1", 333) and rows[20] == ("0", 2020)
    assert all(rows[i][0] == str(i % 2) for i in range(8))


def test_plain_write_delta_refuses_mapped_table(spark, tmp_path):
    """ADVICE r10 (high): a plain write_delta append/overwrite on a
    mapped table would land LOGICAL-named data files that the
    physical-schema reader returns as all-NULL — must fail loud and
    point at write_delta_mapped."""
    from pyspark_anomaly_detection_spark.io.deltalite import write_delta_txn

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 4), t)
    for attempt in (
        lambda: write_delta(_df(spark, 4, 6), t, mode="append"),
        lambda: write_delta(_df(spark, 4, 6), t, mode="overwrite"),
        lambda: write_delta_txn(_df(spark, 4, 6), t, "app", 0),
    ):
        with pytest.raises(NotImplementedError, match="write_delta"):
            attempt()
    # the guard fired before any data or log mutation
    out = read_delta(spark, t)
    assert out.count() == 4 and out.columns == ["id", "v"]


def test_cm_checkpoint_preserves_configuration_for_rename(spark, tmp_path):
    """ADVICE r10 (medium): the checkpoint metaData row must carry the
    configuration map, else expire_log loses delta.columnMapping.mode
    and rename_column_mapped falsely rejects the table."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _snapshot_state,
        create_checkpoint,
        expire_log,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)
    write_delta_mapped(_df(spark, 5, 8), t, mode="append")
    create_checkpoint(t)
    expire_log(t)
    snap = _snapshot_state(t)
    assert (
        snap.meta["configuration"]["delta.columnMapping.mode"] == "name"
    )
    rename_column_mapped(t, "v", "value")  # raised before the fix
    out = read_delta(spark, t)
    assert out.columns == ["id", "value"] and out.count() == 8


# ------------- round 11: COW DML / OPTIMIZE / stats taught the mapping


def test_mapped_cow_delete_update(spark, tmp_path):
    """DELETE and UPDATE on a 'name'-mode table with LOGICAL-name
    predicates/assignments: rewritten files keep physical names, time
    travel sees pre-DML rows, results match the unmapped semantics."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import (
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)       # v0
    write_delta_mapped(_df(spark, 10, 20), t, mode="append")  # v1
    out = delete_delta(spark, t, "id % 4 = 0")     # v2
    assert out["rows_deleted"] == 5
    out = update_delta(spark, t, "id % 3 = 0", {"v": "v + 100"})  # v3
    assert out["rows_updated"] > 0
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    expect = {
        i: (2 * i + 100 if i % 3 == 0 else 2 * i)
        for i in range(20)
        if i % 4 != 0
    }
    assert rows == expect
    # rewritten files still carry physical names only
    phys = _physical_columns(t)
    assert phys == {physical_name("id"), physical_name("v")}
    # time travel to v1 sees the pre-DML rows under logical names
    pre = read_delta(spark, t, version=1)
    assert pre.columns == ["id", "v"] and pre.count() == 20


def test_mapped_merge_upserts(spark, tmp_path):
    """MERGE on a mapped table: matched rows update in place, unmatched
    source rows insert, all files physical-named."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import merge_delta

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 6), t)
    src = spark.createDataFrame(
        [(2, 999), (3, 888), (50, 777)], "id long, v long"
    )
    out = merge_delta(spark, t, src, "id")
    assert out["rows_matched"] == 2 and out["rows_inserted"] == 1
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert rows[2] == 999 and rows[3] == 888 and rows[50] == 777
    assert rows[0] == 0 and rows[1] == 2
    assert _physical_columns(t) == {physical_name("id"), physical_name("v")}


def test_mapped_optimize_and_rename_interplay(spark, tmp_path):
    """OPTIMIZE compacts a mapped table (physical-named output files);
    a metadata-only rename before the OPTIMIZE is honored after it."""
    from pyspark_anomaly_detection_spark.io.deltalite import optimize_delta

    t = str(tmp_path / "t")
    for lo in range(0, 20, 5):
        write_delta_mapped(_df(spark, lo, lo + 5), t, mode="append")
    rename_column_mapped(t, "v", "value")
    out = optimize_delta(spark, t)
    assert out["files_before"] >= 4 and out["files_after"] < out["files_before"]
    res = read_delta(spark, t)
    assert res.columns == ["id", "value"]
    assert sorted(r.id for r in res.collect()) == list(range(20))
    assert _physical_columns(t) >= {physical_name("id"), physical_name("v")}


def test_mapped_zorder_stats_use_physical_names_prune_logical(
    spark, tmp_path
):
    """OPTIMIZE ZORDER on a mapped table: add.stats key PHYSICAL names
    (protocol rule), and read_delta_pruned translates the caller's
    LOGICAL column for both the stats lookup and the file read."""
    import json as _json

    from pyspark_anomaly_detection_spark.io.deltalite import (
        _snapshot_state,
        optimize_delta,
        read_delta_pruned,
    )

    t = str(tmp_path / "t")
    for lo in range(0, 100, 25):
        write_delta_mapped(_df(spark, lo, lo + 25), t, mode="append")
    optimize_delta(spark, t, target_file_bytes=2000, zorder_by=("id", "v"))
    snap = _snapshot_state(t)
    stats = [
        _json.loads(a["stats"])
        for a in snap.adds.values()
        if "stats" in a
    ]
    assert stats and all(
        physical_name("id") in s["minValues"] and "id" not in s["minValues"]
        for s in stats
    )
    df, meta = read_delta_pruned(spark, t, "id", 0, 10)
    assert meta["files_read"] < meta["files_total"]
    assert sorted(r.id for r in df.collect()) == list(range(11))
    # and the columns come back logical, non-NULL
    assert df.columns == ["id", "v"]


# ------------- round 11b: CDF + streaming taught the mapping


def test_mapped_batch_cdf_logical_names(spark, tmp_path):
    """read_delta_changes on a mapped table: inserts and COW-delete
    retractions come back under LOGICAL names (the tip's), with exact
    row attribution — including across a rename."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta_changes,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 6), t)                   # v0
    write_delta_mapped(_df(spark, 6, 10), t, mode="append")   # v1
    rename_column_mapped(t, "v", "value")                     # v2: meta only
    delete_delta(spark, t, "id % 3 = 0")                      # v3: COW
    feed = read_delta_changes(spark, t, from_version=0).collect()
    assert {r._commit_version for r in feed} == {1, 3}
    # the whole range frames in the TIP's logical names
    assert all(hasattr(r, "value") for r in feed)
    v1_ins = sorted(r.id for r in feed if r._commit_version == 1)
    assert v1_ins == [6, 7, 8, 9]
    v3 = [r for r in feed if r._commit_version == 3]
    # COW delete touches every file: all 10 pre-rows retract, survivors re-insert
    assert sorted(r.id for r in v3 if r._change_type == "delete") == list(range(10))
    assert sorted(r.id for r in v3 if r._change_type == "insert") == [
        i for i in range(10) if i % 3 != 0
    ]


def test_mapped_stream_delivers_logical_names(spark, tmp_path):
    """The streaming source renames physical file columns back to the
    logical schema per Arrow batch."""
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)
    write_delta_mapped(_df(spark, 5, 8), t, mode="append")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        read_deltalite_stream(spark, t)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(sink)
    assert set(got.columns) == {"id", "v", "_commit_version"}
    rows = {(r.id, r.v, r._commit_version) for r in got.collect()}
    assert rows == {(i, 2 * i, 0 if i < 5 else 1) for i in range(8)}


def test_mapped_stream_fails_on_midstream_rename(spark, tmp_path):
    """A rename landing inside an unread range invalidates an
    ALREADY-BOUND reader's schema — fail loud at planning time (real
    Delta's non-additive schema-change contract), never deliver rows
    under stale names.  A RESTARTED stream re-binds to the new schema
    and proceeds (the error message's remedy), which is why the guard
    is pinned on the reader object, not a fresh drain."""
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        DeltaliteStreamReader,
        _table_schema,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)  # v0
    reader = DeltaliteStreamReader({"path": t}, _table_schema(t))
    rename_column_mapped(t, "v", "value")    # v1: schema change
    write_delta_mapped(
        spark.range(5, 8).select(
            F.col("id"), (F.col("id") * 2).alias("value")
        ),
        t,
        mode="append",
    )                                        # v2
    with pytest.raises(ValueError, match="changes the table schema"):
        reader.partitions({"version": 0}, {"version": 2})
    # a NEW reader (the restart) binds the renamed schema and plans fine
    fresh = DeltaliteStreamReader({"path": t}, _table_schema(t))
    parts = fresh.partitions({"version": 1}, {"version": 2})
    assert parts and all(p.version == 2 for p in parts)


# ------------- round 11c: deletion vectors × column mapping


@pytest.mark.parametrize("storage", ["i", "u"])
def test_mapped_dv_delete_and_merge(spark, tmp_path, storage):
    """Merge-on-read DELETE on a 'name'-mode table: logical predicates
    bind through the physical schema, bitmaps attach without data
    writes, a second delete merges, reads subtract then rename."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 15), t)
    write_delta_mapped(_df(spark, 15, 30), t, mode="append")
    before = _physical_columns(t)
    out = delete_delta_dv(spark, t, "id % 10 = 7", storage=storage)
    assert out["rows_deleted"] == 3
    assert _physical_columns(t) == before  # no data files written
    out = delete_delta_dv(spark, t, "v >= 40", storage=storage)  # ids 20..29
    assert out["rows_deleted"] == 9  # 27 already gone
    got = read_delta(spark, t)
    assert got.columns == ["id", "v"]
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(30) if i % 10 != 7 and i < 20
    ]
    # time travel before the deletes still sees everything, logical names
    assert read_delta(spark, t, version=1).count() == 30


def test_mapped_dv_purge_and_rename(spark, tmp_path):
    """REORG PURGE on a mapped DV table rewrites only the DV files —
    physical space end-to-end — and a post-purge metadata-only rename
    still works."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
        purge_delta,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 12), t)
    delete_delta_dv(spark, t, "id % 4 = 1")
    out = purge_delta(spark, t)
    assert out["files_purged"] >= 1
    phys = _physical_columns(t)
    assert phys == {physical_name("id"), physical_name("v")}
    rename_column_mapped(t, "v", "value")
    got = read_delta(spark, t)
    assert got.columns == ["id", "value"]
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(12) if i % 4 != 1
    ]


def test_mapped_dv_rowlevel_cdf(spark, tmp_path):
    """Batch CDF across a DV delete on a mapped table yields the exact
    newly-deleted rows under LOGICAL names."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta_changes,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)           # v0
    delete_delta_dv(spark, t, "id % 3 = 0")            # v1 (+protocol)
    feed = read_delta_changes(spark, t, from_version=0).collect()
    assert all(r._change_type == "delete" for r in feed)
    assert sorted(r.id for r in feed) == [0, 3, 6, 9]
    assert all(hasattr(r, "v") for r in feed)


def test_mapped_merge_clause_matrix(spark, tmp_path):
    """Round-12 MERGE clauses compose with column mapping: the condition
    evaluates in LOGICAL space (the shared _read_files rename), delete
    and insert-only branches included."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import merge_delta

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)
    # conditional update: only fresher source rows win
    src = spark.createDataFrame(
        [(2, 999), (3, 0), (50, 777)], "id long, v long"
    )
    out = merge_delta(spark, t, src, "id", matched_condition="src.v > v")
    assert out["rows_matched"] == 2 and out["rows_updated"] == 1
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert rows[2] == 999 and rows[3] == 6 and rows[50] == 777
    # conditional delete, no insert clause
    src2 = spark.createDataFrame([(4, 1), (5, 0)], "id long, v long")
    out2 = merge_delta(
        spark,
        t,
        src2,
        "id",
        matched="delete",
        matched_condition="src.v = 1",
        insert=False,
    )
    assert out2["rows_deleted"] == 1
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert 4 not in rows and rows[5] == 10
    # insert-only: matched files not rewritten, physical names preserved
    out3 = merge_delta(
        spark,
        t,
        spark.createDataFrame([(5, 1), (60, 2)], "id long, v long"),
        "id",
        matched=None,
    )
    assert out3["files_rewritten"] == 0 and out3["rows_inserted"] == 1
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert rows[5] == 10 and rows[60] == 2
    assert _physical_columns(t) == {physical_name("id"), physical_name("v")}


def test_drop_column_is_metadata_only(spark, tmp_path):
    """DROP COLUMN commits only metadata: files byte-identical, the
    column gone from reads, time travel before the drop still sees it,
    and a compaction (REORG PURGE) physically sheds it."""
    from pyspark_anomaly_detection_spark.io.deltalite import optimize_delta
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        drop_column_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)
    before = _physical_columns(t)
    v = drop_column_mapped(t, "v")
    assert _physical_columns(t) == before  # zero data files touched
    assert read_delta(spark, t).columns == ["id"]
    assert read_delta(spark, t, version=v - 1).columns == ["id", "v"]
    # REORG PURGE: compaction rewrites through the committed schema
    # (+ vacuum, so the on-disk walk sees only the tip's files)
    from pyspark_anomaly_detection_spark.io.deltalite import vacuum_delta

    optimize_delta(spark, t)
    vacuum_delta(t, retain_versions=1)
    assert physical_name("v") not in _physical_columns(t)
    assert {r.id for r in read_delta(spark, t).collect()} == set(range(10))


def test_drop_readd_never_resurrects(spark, tmp_path):
    """Delta's no-resurrection contract: re-adding a dropped logical
    name gets a FRESH physical name, so pre-drop values stay invisible;
    only rows appended after the re-add carry values."""
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        add_column_mapped,
        drop_column_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)
    drop_column_mapped(t, "v")
    add_column_mapped(t, "v", "long")
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert rows == {i: None for i in range(10)}  # NOT resurrected
    write_delta_mapped(_df(spark, 10, 15), t, mode="append")
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert all(rows[i] is None for i in range(10))
    assert all(rows[i] == i * 2 for i in range(10, 15))


def test_drop_add_guards(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        add_column_mapped,
        drop_column_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)
    with pytest.raises(ValueError, match="no such column"):
        drop_column_mapped(t, "nope")
    with pytest.raises(ValueError, match="already exists"):
        add_column_mapped(t, "v", "long")
    drop_column_mapped(t, "v")
    with pytest.raises(ValueError, match="last column"):
        drop_column_mapped(t, "id")
    # unmapped tables refuse both
    u = str(tmp_path / "u")
    write_delta(_df(spark, 0, 3), u)
    with pytest.raises(ValueError, match="column-mapped"):
        drop_column_mapped(u, "v")
    with pytest.raises(ValueError, match="column-mapped"):
        add_column_mapped(u, "w", "long")


def test_add_column_bumps_max_column_id(spark, tmp_path):
    import json

    from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        add_column_mapped,
        drop_column_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)  # ids 1, 2
    drop_column_mapped(t, "v")
    add_column_mapped(t, "w", "double")      # id 3
    add_column_mapped(t, "v", "long")        # id 4, fresh physical name
    snap = _snapshot_state(t)
    conf = snap.meta["configuration"]
    assert conf["delta.columnMapping.maxColumnId"] == "4"
    fields = {f["name"]: f for f in json.loads(snap.schema_json)["fields"]}
    assert fields["v"]["metadata"]["delta.columnMapping.id"] == 4
    assert (
        fields["v"]["metadata"]["delta.columnMapping.physicalName"]
        != physical_name("v")
    )


def test_check_constraints_on_mapped_tables(spark, tmp_path):
    """CHECK constraints x column mapping (round 13 — was a fail-loud
    guard): the predicate is stored and evaluated in LOGICAL names.
    Violating appends and violating COW updates abort with nothing
    visible; renaming a referenced column refuses."""
    from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
        DeltaliteConstraintViolation,
        add_check_constraint,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import update_delta

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 10), t)  # v = 2*id >= 0
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")

    # violating mapped append aborts; table unchanged
    bad = spark.createDataFrame([(100, -1)], "id long, v long")
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        write_delta_mapped(bad, t, mode="append")
    assert read_delta(spark, t).count() == 10

    # violating COW UPDATE aborts through the physical->logical
    # translation of the staged rewrite; table unchanged
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        update_delta(spark, t, "id = 3", {"v": "-5"})
    assert {r.v for r in read_delta(spark, t).collect()} == {
        i * 2 for i in range(10)
    }

    # valid paths still work
    write_delta_mapped(_df(spark, 10, 12), t, mode="append")
    update_delta(spark, t, "id = 3", {"v": "99"})
    rows = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert rows[3] == 99 and rows[11] == 22

    # renaming a constrained column refuses (the predicate would break)
    with pytest.raises(ValueError, match="referenced by"):
        rename_column_mapped(t, "v", "w")
    # unconstrained columns still rename
    rename_column_mapped(t, "id", "ident")
    assert read_delta(spark, t).columns == ["ident", "v"]


def test_drop_constrained_column_refuses_mapped(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
        add_check_constraint,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        drop_column_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(_df(spark, 0, 5), t)
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="referenced by"):
        drop_column_mapped(t, "v")
