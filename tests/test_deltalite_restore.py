"""RESTORE on deltalite: file-set reconciliation back to an earlier
version as a new commit — zero Parquet rewritten, history preserved,
metadata/DV descriptors restored, VACUUMed targets fail loud, CDF
surfaces the rollback as ordinary inserts+deletes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    delta_history,
    read_delta,
    read_delta_changes,
    vacuum_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta
from pyspark_anomaly_detection_spark.io.deltalite_restore import restore_delta


def _ids(spark, t, version=None):
    return sorted(r.id for r in read_delta(spark, t, version=version).collect())


def _build(spark, t, n_files=4, width=10):
    for i in range(n_files):
        write_delta(
            spark.range(i * width, (i + 1) * width)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            t,
            mode="append",
        )


def _file_bytes(t):
    out = {}
    for root, _dirs, files in os.walk(t):
        if "_delta_log" in root:
            continue
        for n in files:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out[os.path.relpath(p, t)] = open(p, "rb").read()
    return out


def test_restore_rolls_back_delete(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)  # v0..v3, ids 0..39
    delete_delta(spark, t, "id % 3 = 0")  # v4
    assert _ids(spark, t) == [i for i in range(40) if i % 3]
    out = restore_delta(t, version=3)
    assert out["version"] == 5
    assert out["files_readded"] >= 1 and out["files_removed"] >= 1
    assert _ids(spark, t) == list(range(40))
    # history preserved: time travel INTO the rolled-back span works
    assert _ids(spark, t, version=4) == [i for i in range(40) if i % 3]
    assert _ids(spark, t, version=3) == list(range(40))


def test_restore_writes_no_parquet(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta(spark, t, "id >= 35")  # rewrites the last file
    before = _file_bytes(t)
    restore_delta(t, version=3)
    after = _file_bytes(t)
    # pure metadata op: the data-file set on disk is untouched
    assert before == after


def test_restore_dry_run_and_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)
    delete_delta(spark, t, "id = 5")
    dry = restore_delta(t, version=1, dry_run=True)
    assert dry["version"] == 2  # unchanged: no commit
    assert dry["files_readded"] == 1 and dry["files_removed"] == 1
    assert len(delta_history(t)) == 3
    # restoring to the current state commits nothing
    noop = restore_delta(t, version=2)
    assert noop["version"] == 2
    assert noop["files_readded"] == 0 and noop["files_removed"] == 0


def test_restore_after_vacuum_fails_loud(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)
    delete_delta(spark, t, "id < 10")  # tombstones file 0's parquet
    vacuum_delta(t, retain_versions=1)  # physically deletes it
    with pytest.raises(FileNotFoundError, match="VACUUM"):
        restore_delta(t, version=1)


def test_restore_rolls_back_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(spark.range(5).select("id"), t)
    write_delta(
        spark.range(5, 10).select("id", F.lit("x").alias("tag")),
        t,
        mode="append",
        merge_schema=True,
    )  # v1 evolves the schema
    out = restore_delta(t, version=0)
    assert out["metadata_restored"] == 1
    restored = read_delta(spark, t)
    assert restored.columns == ["id"]
    assert sorted(r.id for r in restored.collect()) == list(range(5))


def test_restore_partitioned_preserves_partition_values(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta(df, t, partition_by=["p"])  # v0
    delete_delta(spark, t, "id >= 10")  # v1
    restore_delta(t, version=0)  # v2
    got = read_delta(spark, t)
    assert got.count() == 20
    # partition column reconstructed from the re-added adds' partitionValues
    assert got.filter(F.col("p") == "1").count() == 10


def test_restore_across_dv_delete_resurrects_rows(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite_dv import delete_delta_dv

    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)  # v0, v1: ids 0..19
    delete_delta_dv(spark, t, "id % 4 = 0")  # v2: DV merge-on-read
    assert _ids(spark, t) == [i for i in range(20) if i % 4]
    restore_delta(t, version=1)  # roll the DV delete back
    assert _ids(spark, t) == list(range(20))
    # and restore FORWARD to the DV'd version re-applies the bitmap
    restore_delta(t, version=2)
    assert _ids(spark, t) == [i for i in range(20) if i % 4]


def test_restore_breaks_stream_unless_ignore_changes(spark, tmp_path):
    """Delta's streaming-source contract applies to RESTORE too: the
    rollback commit carries dataChange removes, so a plain stream
    raises; with ignoreChanges the re-added files re-deliver."""
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    def drain(stream, ckpt, sink):
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)  # ids 0..19
    delete_delta(spark, t, "id < 10")
    restore_delta(t, version=1)
    with pytest.raises(Exception, match="ignoreChanges|STREAM_FAILED"):
        drain(
            read_deltalite_stream(spark, t),
            str(tmp_path / "ck1"),
            str(tmp_path / "s1"),
        )
    out = drain(
        read_deltalite_stream(spark, t, ignore_changes=True),
        str(tmp_path / "ck2"),
        str(tmp_path / "s2"),
    )
    got = sorted(r.id for r in out.collect())
    # ids 0..9 delivered twice: once from v0's add, once from the
    # restore's re-add (ignoreChanges = at-least-once on rewrites)
    assert got == sorted(list(range(20)) + list(range(10)))


def test_restore_surfaces_in_change_feed(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)  # ids 0..19
    delete_delta(spark, t, "id < 10")  # v2: removes file 0
    v_restore = restore_delta(t, version=1)["version"]
    feed = read_delta_changes(spark, t, from_version=v_restore - 1)
    ins = sorted(
        r.id for r in feed.filter(F.col("_change_type") == "insert").collect()
    )
    # the rolled-back rows come back as inserts of the re-added file
    assert ins == list(range(10))
    assert (
        feed.filter(F.col("_change_type") == "delete").count() == 0
        or sorted(
            r.id
            for r in feed.filter(F.col("_change_type") == "delete").collect()
        )
        == list(range(10, 20))
    )


def test_cdf_stream_delivers_restore_as_changes(spark, tmp_path):
    """CDF-mode stream across a RESTORE: the rollback commit feeds
    delete rows (for the files it removes) and insert rows (for the
    files it re-adds) attributed to the restore's commit version."""
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    def drain(ckpt, sink):
        q = (
            read_deltalite_stream(spark, t, read_change_feed=True)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    t = str(tmp_path / "t")
    _build(spark, t, n_files=2)  # ids 0..19
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    drain(ckpt, sink)  # consume the append history
    delete_delta(spark, t, "id < 10")  # v2
    v_restore = restore_delta(t, version=1)["version"]
    out = drain(ckpt, sink)  # same checkpoint: only the new commits
    restore_rows = out.filter(F.col("_commit_version") == v_restore)
    ins = sorted(
        r.id
        for r in restore_rows.filter(F.col("_change_type") == "insert").collect()
    )
    assert ins == list(range(10))  # the rolled-back rows come back
