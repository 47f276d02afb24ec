"""Deletion vectors: roaring/Z85 codec round-trips, merge-on-read
DELETE semantics (no data files written, DV merge, time travel), the
DV-subtracting reader, and the fail-loud guards on operations that
would corrupt a DV table."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    delta_history,
    read_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dv import (
    delete_delta_dv,
    z85_decode,
    z85_encode,
)
from pyspark_anomaly_detection_spark.io.roaring import (
    deserialize_roaring32,
    deserialize_roaring64,
    serialize_roaring32,
    serialize_roaring64,
)


def test_roaring32_round_trips_all_container_kinds():
    random.seed(11)
    cases = [
        [0],
        [65535, 65536, 0xFFFFFFFF],
        list(range(300)),                      # run container
        sorted(random.sample(range(1 << 16), 3000)),   # array
        sorted(random.sample(range(1 << 16), 9000)),   # bitmap
        list(range(0, 1 << 17, 1)),            # runs across containers
    ]
    for c in cases:
        got, _ = deserialize_roaring32(serialize_roaring32(c))
        assert got == c


def test_roaring64_round_trip_sparse_buckets():
    random.seed(13)
    vals = sorted(
        set(random.sample(range(1 << 45), 2000))
        | {0, 1 << 32, (1 << 32) + 1, (77 << 32) + 123}
    )
    assert deserialize_roaring64(serialize_roaring64(vals)) == vals
    assert deserialize_roaring64(serialize_roaring64([])) == []


def test_z85_round_trip_with_padding():
    for n in range(0, 9):
        data = bytes(range(n))
        enc = z85_encode(data)
        assert len(enc) % 5 == 0
        assert z85_decode(enc, size=n) == data


def _parquet_files(t):
    out = []
    for root, _dirs, files in os.walk(t):
        if "_delta_log" in root:
            continue
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return sorted(out)


def _build(spark, t):
    for i in range(3):
        write_delta(
            spark.range(i * 10, (i + 1) * 10)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            t,
            mode="append",
        )


def test_dv_delete_writes_no_data_files(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)  # ids 0..29
    before = _parquet_files(t)
    out = delete_delta_dv(spark, t, "id % 10 = 7")
    assert out["rows_deleted"] == 3
    assert out["files_with_dv"] == 3
    assert _parquet_files(t) == before  # merge-on-read: zero data writes
    ids = sorted(r.id for r in read_delta(spark, t).collect())
    assert ids == [i for i in range(30) if i % 10 != 7]


def test_dv_second_delete_merges_and_counts_only_new(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id % 10 = 7")  # deletes 7, 17, 27
    # %7==0 matches {0, 7, 14, 21, 28}; 7 is already deleted -> 4 new
    out = delete_delta_dv(spark, t, "id % 7 = 0")
    assert out["rows_deleted"] == 4
    ids = sorted(r.id for r in read_delta(spark, t).collect())
    want = [i for i in range(30) if i % 10 != 7 and i % 7 != 0]
    assert ids == want


def test_dv_time_travel_sees_pre_delete_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    out = delete_delta_dv(spark, t, "id < 5")
    assert read_delta(spark, t, version=2).count() == 30
    assert read_delta(spark, t, version=out["version"]).count() == 25
    hist = delta_history(t)
    assert hist[-1]["version"] == out["version"]


def test_dv_noop_when_nothing_matches(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    out = delete_delta_dv(spark, t, "id > 999")
    assert out["rows_deleted"] == 0 and out["files_with_dv"] == 0
    assert read_delta(spark, t).count() == 30


def test_dv_guards_fail_loud(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite import (
        annotate_stats,
        optimize_delta,
        read_delta_changes,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import (
        delete_delta,
        merge_delta,
        update_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id = 3")
    with pytest.raises(NotImplementedError):
        optimize_delta(spark, t)
    with pytest.raises(NotImplementedError):
        annotate_stats(t, ["id"])
    with pytest.raises(NotImplementedError):
        read_delta_changes(spark, t, from_version=0).collect()
    with pytest.raises(NotImplementedError):
        delete_delta(spark, t, "id = 4")
    with pytest.raises(NotImplementedError):
        update_delta(spark, t, "id = 4", {"v": "v + 1"})
    with pytest.raises(NotImplementedError):
        merge_delta(
            spark,
            t,
            spark.createDataFrame([(4, 44)], "id long, v long"),
            key="id",
        )
    # streaming source refuses the DV commit at planning time (the
    # commit's remove hits the non-append guard first; the dedicated
    # deletion-vector guard covers dataChange DV adds without removes)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        read_deltalite_stream(spark, t)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="removes data|deletion-vector"):
        q.awaitTermination()
    # change-feed mode reaches the add and must hit the DV guard
    q2 = (
        read_deltalite_stream(spark, t, read_change_feed=True)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink2"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="deletion-vector"):
        q2.awaitTermination()


def test_dv_append_after_delete_still_works(spark, tmp_path):
    """Blind appends commute with DV state: new files land DV-free and
    read normally alongside DV-subtracted older files."""
    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id < 10")
    write_delta(
        spark.range(100, 105)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1),
        t,
        mode="append",
    )
    ids = sorted(r.id for r in read_delta(spark, t).collect())
    assert ids == list(range(10, 30)) + list(range(100, 105))


def test_roaring_property_random_sets():
    """Hypothesis sweep: arbitrary uint64 sets round-trip the portable
    serialization exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.sets(
            st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=500
        )
    )
    def check(vals):
        assert deserialize_roaring64(serialize_roaring64(vals)) == sorted(vals)

    check()


def test_dv_large_delete_exercises_bitmap_containers(spark, tmp_path):
    """A 200k-row delete puts >4096 positions in single 64k chunks —
    the BITMAP container path — and the reader must still subtract
    exactly."""
    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 200_000).select(F.col("id")).coalesce(2), t
    )
    out = delete_delta_dv(spark, t, "id % 2 = 0")
    assert out["rows_deleted"] == 100_000
    got = read_delta(spark, t)
    assert got.count() == 100_000
    assert got.filter("id % 2 = 0").count() == 0
    # descriptors stay metadata-sized: the log carries the bitmaps inline
    import json as _json

    log_dir = os.path.join(t, "_delta_log")
    last = sorted(os.listdir(log_dir))[-1]
    blob = open(os.path.join(log_dir, last)).read()
    assert len(blob) < 200_000  # ~25KB of bitmap vs 100k deleted rows


def test_dv_commit_conflicts_with_interleaved_append(spark, tmp_path):
    """A DV delete carries a protocol action + same-path remove/re-add,
    so an interleaved append aborts it (ConcurrentAppend) instead of
    silently rebasing over unseen data."""
    import pyspark_anomaly_detection_spark.io.deltalite as dl

    t = str(tmp_path / "t")
    _build(spark, t)
    real_list = dl._list_versions

    # freeze the version listing the DV writer sees, then land a real
    # append "concurrently"
    write_delta(
        spark.range(500, 510).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        t,
        mode="append",
    )
    import unittest.mock as mock

    with mock.patch.object(
        dl, "_list_versions", lambda p: [v for v in real_list(p) if v <= 2]
    ):
        with pytest.raises(dl.DeltaliteConcurrentCommit):
            delete_delta_dv(spark, t, "id = 3")


def test_dv_checkpoint_round_trip(spark, tmp_path):
    """Round 10b: checkpoints carry DV descriptors and the table's real
    protocol — a DV table replays from its checkpoint losslessly even
    after the JSON log expires."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _read_checkpoint,
        create_checkpoint,
        expire_log,
    )

    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id % 10 = 7")
    v = create_checkpoint(t)
    actions = _read_checkpoint(t, v)
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos and protos[0]["minReaderVersion"] == 3
    assert protos[0]["readerFeatures"] == ["deletionVectors"]
    dvs = [
        a["add"]["deletionVector"]
        for a in actions
        if "add" in a and a["add"].get("deletionVector")
    ]
    assert len(dvs) == 3 and all(d["storageType"] == "i" for d in dvs)
    expire_log(t)
    ids = sorted(r.id for r in read_delta(spark, t).collect())
    assert ids == [i for i in range(30) if i % 10 != 7]


def test_cm_checkpoint_round_trip(spark, tmp_path):
    """Mapped tables checkpoint with their v2 protocol and mapped
    schemaString; replay after log expiry still reads logical names."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        create_checkpoint,
        expire_log,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        write_delta_mapped,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(
        spark.range(0, 6).select(F.col("id"), (F.col("id") * 2).alias("v")),
        t,
    )
    write_delta_mapped(
        spark.range(6, 9).select(F.col("id"), (F.col("id") * 2).alias("v")),
        t,
        mode="append",
    )
    create_checkpoint(t)
    expire_log(t)
    out = read_delta(spark, t)
    assert out.columns == ["id", "v"]
    assert out.count() == 9


def test_purge_materializes_dvs(spark, tmp_path):
    """REORG APPLY (PURGE): rewrites only DV files, drops the deleted
    rows physically, leaves the table DV-free (OPTIMIZE and COW DML
    work again), commits dataChange=false, keeps time travel."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _snapshot_state,
        optimize_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dv import purge_delta

    t = str(tmp_path / "t")
    _build(spark, t)
    dv_ver = delete_delta_dv(spark, t, "id % 10 = 7")["version"]
    out = purge_delta(spark, t)
    assert out["files_purged"] == 3
    snap = _snapshot_state(t)
    assert not any(a.get("deletionVector") for a in snap.adds.values())
    want = [i for i in range(30) if i % 10 != 7]
    assert sorted(r.id for r in read_delta(spark, t).collect()) == want
    # time travel: the DV version still subtracts, the pre-DV sees all
    assert read_delta(spark, t, version=dv_ver).count() == 27
    assert read_delta(spark, t, version=dv_ver - 1).count() == 30
    # DV-free again: previously-guarded ops work
    res = optimize_delta(spark, t)
    assert res["files_after"] >= 1
    # idempotent: a second purge is a no-op
    again = purge_delta(spark, t)
    assert again["files_purged"] == 0


def test_purge_is_stream_transparent(spark, tmp_path):
    """dataChange=false remove+add: a non-CDF stream replays the table
    across the purge without raising and without duplicating rows."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import purge_delta
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id % 10 = 7")  # touches all three files
    purge_delta(spark, t)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        read_deltalite_stream(spark, t, ignore_changes=True)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.id for r in spark.read.parquet(sink).collect())
    # original appends deliver 0..29; the DV commit re-delivers each
    # touched file's LIVE rows (everything but 7/17/27 — Delta's
    # ignoreChanges re-delivery, no retraction); the purge's
    # dataChange=false files are transparent
    live = [i for i in range(30) if i % 10 != 7]
    assert ids == sorted(list(range(30)) + live)


def test_dv_protocol_upgrade_emitted_once(spark, tmp_path):
    """ADVICE r10: the deletionVectors protocol upgrade is a ONE-TIME
    commit action (like real Delta) — the second DV delete must not
    re-emit it."""
    import json

    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id % 10 = 7")
    delete_delta_dv(spark, t, "id % 10 = 8")
    log_dir = os.path.join(t, "_delta_log")
    upgrades = 0
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        for line in open(os.path.join(log_dir, name)):
            a = json.loads(line)
            if "protocol" in a and a["protocol"].get("minReaderVersion") == 3:
                upgrades += 1
    assert upgrades == 1
    # both deletes still applied
    ids = sorted(r.id for r in read_delta(spark, t).collect())
    assert ids == [i for i in range(30) if i % 10 not in (7, 8)]


def test_blind_append_rebases_over_second_dv_delete(spark, tmp_path):
    """With the one-time upgrade, a blind append losing the race to a
    SECOND DV delete (no protocol action in its commit) rebases instead
    of raising a spurious protocol conflict."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _commit_with_retry,
        _list_versions,
    )

    t = str(tmp_path / "t")
    _build(spark, t)
    delete_delta_dv(spark, t, "id = 1")   # one-time upgrade + DV
    stale_tip = _list_versions(t)[-1]
    delete_delta_dv(spark, t, "id = 2")   # DV only — no protocol action
    got = _commit_with_retry(
        t,
        stale_tip + 1,
        [
            {"add": {"path": "x.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
            {"commitInfo": {"operation": "WRITE", "engineInfo": "test"}},
        ],
    )
    assert got == stale_tip + 2


def test_norm_file_path_col_accepts_all_uri_renderings(spark):
    """ADVICE r10: the DV anti-join key must be scheme-independent —
    file:/abs, file://abs-ish, file:///abs and a plain path all
    normalize to the same absolute path."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        _norm_file_path_col,
    )

    df = spark.createDataFrame(
        [("file:/tmp/a/b.parquet",),
         ("file:///tmp/a/b.parquet",),
         ("/tmp/a/b.parquet",)],
        "p string",
    ).select(_norm_file_path_col(F.col("p")).alias("n"))
    assert {r.n for r in df.collect()} == {"/tmp/a/b.parquet"}
