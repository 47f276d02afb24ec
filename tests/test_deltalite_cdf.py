"""Row-level change data feed for copy-on-write DML (round 14 —
verdict r13 item 3): with ``delta.enableChangeDataFeed=true``, DML
rewrites write spec-shaped ``_change_data`` files + ``cdc`` actions,
and both CDF surfaces (batch + streaming) read THOSE instead of the
file-level add/remove reconstruction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    read_delta,
    read_delta_changes,
    set_table_properties,
    vacuum_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)


def _cdf_table(spark, t, n=100):
    write_delta(
        spark.range(0, n).select(F.col("id"), (F.col("id") * 2).alias("v")),
        t,
    )
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})


def _feed_counts(spark, t, frm=1):
    feed = read_delta_changes(spark, t, from_version=frm)
    return {
        (r._commit_version, r._change_type): r["count"]
        for r in feed.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }


def test_cdf_update_emits_only_changed_rows(spark, tmp_path):
    """A 1-row UPDATE in a 100-row file feeds exactly 1 preimage + 1
    postimage — never the file-level 100 deletes + 100 inserts."""
    t = str(tmp_path / "t")
    _cdf_table(spark, t)
    update_delta(spark, t, "id = 5", {"v": "v + 1000"})
    feed = read_delta_changes(spark, t, from_version=1)
    rows = [(r._change_type, r.id, r.v) for r in feed.collect()]
    assert sorted(rows) == [
        ("update_postimage", 5, 1010),
        ("update_preimage", 5, 10),
    ]


def test_cdf_delete_and_merge_clauses(spark, tmp_path):
    t = str(tmp_path / "t")
    _cdf_table(spark, t)
    delete_delta(spark, t, "id % 10 = 7")  # v2: 10 deletes
    src = spark.createDataFrame(
        [(8, 888), (200, 2)], "id long, v long"
    )
    merge_delta(spark, t, src, key="id")  # v3: 1 update + 1 insert
    counts = _feed_counts(spark, t)
    assert counts == {
        (2, "delete"): 10,
        (3, "insert"): 1,
        (3, "update_preimage"): 1,
        (3, "update_postimage"): 1,
    }
    # change VALUES are exact, not just counted
    feed = read_delta_changes(spark, t, from_version=2, to_version=3)
    rows = {(r._change_type, r.id): r.v for r in feed.collect()}
    assert rows[("insert", 200)] == 2
    assert rows[("update_preimage", 8)] == 16
    assert rows[("update_postimage", 8)] == 888


def test_cdf_merge_nmbs_and_matched_delete(spark, tmp_path):
    t = str(tmp_path / "t")
    _cdf_table(spark, t, n=20)
    src = spark.createDataFrame(
        [(3, 333), (30, 3030)], "id long, v long"
    )
    merge_delta(
        spark,
        t,
        src,
        key="id",
        matched="delete",
        not_matched_by_source="update",
        not_matched_by_source_set={"v": "v + 10000"},
        not_matched_by_source_condition="id >= 18",
    )
    counts = _feed_counts(spark, t)
    assert counts == {
        (2, "delete"): 1,  # matched delete of id 3
        (2, "insert"): 1,  # id 30
        (2, "update_preimage"): 2,  # ids 18, 19 (NMBS update)
        (2, "update_postimage"): 2,
    }
    rows = {
        (r._change_type, r.id): r.v
        for r in read_delta_changes(spark, t, from_version=1).collect()
    }
    assert rows[("delete", 3)] == 6
    assert rows[("update_postimage", 18)] == 36 + 10000


def test_cdf_partitioned_carries_partition_values(spark, tmp_path):
    """cdc files are hive-partitioned like the table; a partition-
    moving MERGE update feeds its preimage in the OLD partition and
    its postimage in the NEW one."""
    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 8).select(
            F.col("id"),
            (F.col("id") * 2).alias("v"),
            (F.col("id") % 2).cast("string").alias("side"),
        ),
        t,
        partition_by=["side"],
    )
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    src = spark.createDataFrame(
        [(4, 444, "1")], "id long, v long, side string"
    )  # id 4 moves side 0 -> 1
    merge_delta(spark, t, src, key="id")
    rows = {
        (r._change_type): (r.id, r.v, r.side)
        for r in read_delta_changes(spark, t, from_version=1).collect()
    }
    assert rows["update_preimage"] == (4, 8, "0")
    assert rows["update_postimage"] == (4, 444, "1")
    got = {r.id: r.side for r in read_delta(spark, t).collect()}
    assert got[4] == "1"


def test_cdf_mapped_table_round_trips(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        write_delta_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(
        spark.range(0, 10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ),
        t,
    )
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    update_delta(spark, t, "id = 3", {"v": "v * 10"})
    rows = [
        (r._change_type, r.id, r.v)
        for r in read_delta_changes(spark, t, from_version=1).collect()
    ]
    assert sorted(rows) == [
        ("update_postimage", 3, 60),
        ("update_preimage", 3, 6),
    ]


def test_cdf_survives_vacuum(spark, tmp_path):
    """The add-based VACUUM sweep must not delete _change_data files —
    their retention follows the log's."""
    t = str(tmp_path / "t")
    _cdf_table(spark, t)
    delete_delta(spark, t, "id < 10")
    vacuum_delta(t)  # removes the pre-delete data file generation
    counts = _feed_counts(spark, t)
    assert counts == {(2, "delete"): 10}


def test_cdf_disabled_keeps_file_level_reconstruction(spark, tmp_path):
    """Without the table property, DML writes no cdc actions and the
    feed reconstructs file-level delete+insert as before."""
    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 10)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1),
        t,
    )
    update_delta(spark, t, "id = 5", {"v": "v + 1"})
    counts = _feed_counts(spark, t, frm=0)
    assert counts[(1, "delete")] == 10 and counts[(1, "insert")] == 10
    log = os.path.join(t, "_delta_log")
    assert not os.path.exists(os.path.join(t, "_change_data"))
    assert os.path.isdir(log)


def test_cdf_streaming_delivers_row_level_changes(spark, tmp_path):
    """The streaming CDF source reads _change_data files for cdc
    commits — _change_type comes from the file, not a constant."""
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    t = str(tmp_path / "t")
    _cdf_table(spark, t, n=50)
    update_delta(spark, t, "id = 7", {"v": "v + 100"})
    delete_delta(spark, t, "id = 9")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
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
    out = spark.read.parquet(sink)
    changes = [
        (r._commit_version, r._change_type, r.id, r.v)
        for r in out.filter(F.col("_commit_version") >= 2).collect()
    ]
    assert sorted(changes) == [
        (2, "update_postimage", 7, 114),
        (2, "update_preimage", 7, 14),
        (3, "delete", 9, 18),
    ]


def test_cdf_files_reclaimed_after_log_expiry(spark, tmp_path):
    """cdc retention follows the log: VACUUM keeps _change_data while
    the commit JSON exists and reclaims it once expire_log deleted the
    commit (the files are unreachable then — the feed range raises)."""
    import pytest

    from pyspark_anomaly_detection_spark.io.deltalite import (
        create_checkpoint,
        expire_log,
    )

    t = str(tmp_path / "t")
    _cdf_table(spark, t)
    delete_delta(spark, t, "id < 10")  # v2: cdc files land
    cdc_root = os.path.join(t, "_change_data")
    assert os.path.isdir(cdc_root) and os.listdir(cdc_root)
    vacuum_delta(t)
    assert os.listdir(cdc_root)  # live commit: kept
    write_delta(
        spark.range(200, 205).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ),
        t,
        mode="append",
    )
    create_checkpoint(t)  # horizon at v3
    expire_log(t)  # v0..v2 JSONs gone
    with pytest.raises(ValueError, match="expired|missing|not in log"):
        read_delta_changes(spark, t, from_version=1, to_version=2).count()
    vacuum_delta(t)
    assert not os.path.isdir(cdc_root) or not os.listdir(cdc_root)


def test_cdf_dml_on_dv_table_counts_live_rows_only(spark, tmp_path):
    """CDF × DV × COW composition: a COW UPDATE on a table whose files
    carry deletion vectors feeds only LIVE changed rows (the cdc scan
    reads through the bitmaps), and the cdc commit supersedes the
    file-level view entirely."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    t = str(tmp_path / "t")
    _cdf_table(spark, t, n=30)
    delete_delta_dv(spark, t, "id % 10 = 5")  # v2: DV delete (3 rows)
    update_delta(spark, t, "id % 5 = 0", {"v": "v + 1000"})  # v3
    feed = read_delta_changes(spark, t, from_version=2)
    rows = [(r._change_type, r.id, r.v) for r in feed.collect()]
    # live %5 keys: 0,10,20 (5,15,25 are DV-deleted) — 3 pre + 3 post
    want = []
    for i in (0, 10, 20):
        want.append(("update_preimage", i, i * 2))
        want.append(("update_postimage", i, i * 2 + 1000))
    assert sorted(rows) == sorted(want)


def test_cdc_commit_conflict_matrix(spark, tmp_path):
    """Round 14: cdc actions ride existing conflict semantics — an
    insert-only commit carrying cdc actions is still a blind append
    (REBASES over an interleaved append), while a DML rewrite carrying
    removes + cdc conflicts with ANY interleaved data change."""
    import json

    import pytest

    from pyspark_anomaly_detection_spark.io.deltalite import (
        DeltaliteConcurrentCommit,
        _commit_with_retry,
        _log_path,
    )

    t = str(tmp_path / "t")
    _cdf_table(spark, t, n=10)  # v0 write, v1 property
    # simulate an interleaved blind append claiming v2
    with open(_log_path(t, 2), "w") as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "interleaved/x.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
            + json.dumps({"commitInfo": {"operation": "WRITE"}})
            + "\n"
        )
    # insert-only + cdc: no removes, no metadata -> rebases to v3
    ver = _commit_with_retry(
        t,
        2,
        [
            {"commitInfo": {"operation": "MERGE"}},
            {
                "add": {
                    "path": "ins/y.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {
                "cdc": {
                    "path": "_change_data/ins/y.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "dataChange": False,
                }
            },
        ],
    )
    assert ver == 3
    # rewrite (remove + add + cdc) targeted at an already-taken version
    # conflicts with the interleaved data change
    with open(_log_path(t, 4), "w") as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "interleaved/z.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
            + json.dumps({"commitInfo": {"operation": "WRITE"}})
            + "\n"
        )
    with pytest.raises(DeltaliteConcurrentCommit):
        _commit_with_retry(
            t,
            4,
            [
                {"commitInfo": {"operation": "DELETE"}},
                {"remove": {"path": "ins/y.parquet", "dataChange": True}},
                {
                    "cdc": {
                        "path": "_change_data/d/w.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "dataChange": False,
                    }
                },
            ],
        )
