"""Streaming source over deltalite tables: version-offset incremental
consumption, restart exactly-once, per-file partition fan-out, partition
column reconstruction, and the non-append failure contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    optimize_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_stream import (
    read_deltalite_stream,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1)
    )


def _drain(spark, stream, ckpt, sink):
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


def test_full_history_then_incremental_restart(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    write_delta(_df(spark, 0, 10), t)
    write_delta(_df(spark, 10, 15), t, mode="append")

    out = _drain(spark, read_deltalite_stream(spark, t), ckpt, sink)
    assert sorted(r.id for r in out.collect()) == list(range(15))
    # provenance column attributes every row to its commit
    by_ver = {
        r._commit_version: r.n
        for r in out.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    assert by_ver == {0: 10, 1: 5}

    # restart from the same checkpoint: ONLY the new commit streams
    write_delta(_df(spark, 15, 18), t, mode="append")
    out2 = _drain(spark, read_deltalite_stream(spark, t), ckpt, sink)
    assert sorted(r.id for r in out2.collect()) == list(range(18))
    assert out2.filter(F.col("_commit_version") == 2).count() == 3
    # no duplicates: each id exactly once
    assert out2.groupBy("id").count().filter("count > 1").count() == 0


def test_partitioned_table_reconstructs_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    df = (
        spark.range(0, 20)
        .select(F.col("id"), (F.col("id") % 2).cast("string").alias("side"))
        .coalesce(1)
    )
    write_delta(df, t, partition_by=["side"])
    out = _drain(
        spark,
        read_deltalite_stream(spark, t),
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
    )
    got = {(r.id, r.side) for r in out.collect()}
    assert got == {(i, str(i % 2)) for i in range(20)}


def test_overwrite_fails_unless_ignore_changes(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 100, 103), t, mode="overwrite")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(Exception, match="ignoreChanges|STREAM_FAILED"):
        _drain(
            spark,
            read_deltalite_stream(spark, t),
            str(tmp_path / "ck1"),
            str(tmp_path / "s1"),
        )

    out = _drain(
        spark,
        read_deltalite_stream(spark, t, ignore_changes=True),
        str(tmp_path / "ck2"),
        str(tmp_path / "s2"),
    )
    # ignoreChanges: adds from BOTH commits flow (removed rows are not
    # retracted) — Delta's documented semantics
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4, 100, 101, 102]


def test_optimize_is_transparent_to_the_stream(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    write_delta(_df(spark, 0, 8), t)
    out = _drain(spark, read_deltalite_stream(spark, t), ckpt, sink)
    assert out.count() == 8
    optimize_delta(spark, t)  # dataChange=false remove+add
    write_delta(_df(spark, 8, 11), t, mode="append")
    out2 = _drain(spark, read_deltalite_stream(spark, t), ckpt, sink)
    # the OPTIMIZE commit contributed nothing; the append streamed once
    assert sorted(r.id for r in out2.collect()) == list(range(11))


def test_starting_version_skips_history(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10), t)
    write_delta(_df(spark, 10, 12), t, mode="append")
    out = _drain(
        spark,
        read_deltalite_stream(spark, t, starting_version=1),
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
    )
    assert sorted(r.id for r in out.collect()) == [10, 11]


def test_change_feed_stream_reports_dml(spark, tmp_path):
    """readChangeFeed=true: a DELETE's copy-on-write rewrite streams as
    delete rows (whole old file) + insert rows (survivors), attributed
    to the right commit; the append before it streams as inserts."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10), t)                       # v0
    write_delta(_df(spark, 10, 14), t, mode="append")       # v1
    delete_delta(spark, t, "id >= 2 AND id < 4")            # v2 (file of v0)

    out = _drain(
        spark,
        read_deltalite_stream(spark, t, read_change_feed=True),
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
    )
    counts = {
        (r._commit_version, r._change_type): r.n
        for r in out.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {
        (0, "insert"): 10,
        (1, "insert"): 4,
        (2, "delete"): 10,   # the rewritten file's full pre-image
        (2, "insert"): 8,    # its survivors
    }
    # net view reconstructable from the feed: inserts minus deletes
    net = (
        out.groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("alive")
        )
        .filter("alive > 0")
    )
    assert sorted(r.id for r in net.collect()) == [
        i for i in range(14) if not (2 <= i < 4)
    ]
    # an overwrite does NOT fail the change-feed stream: it feeds deletes
    write_delta(_df(spark, 100, 102), t, mode="overwrite")  # v3
    out2 = _drain(
        spark,
        read_deltalite_stream(spark, t, read_change_feed=True),
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
    )
    v3 = {
        r._change_type: r.n
        for r in out2.filter("_commit_version = 3")
        .groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert v3 == {"delete": 12, "insert": 2}


def test_partitioned_stream_typed_non_string_partitions(spark, tmp_path):
    """ADVICE r9 (low): partition reconstruction must emit arrow arrays
    of the FIELD's type — an untyped pa.array yields int64 for any int
    (mismatching integer fields), a null-typed array for None, and
    strings for dates.  Integer + date partition columns round-trip
    typed here."""
    import datetime

    t = str(tmp_path / "t")
    df = (
        spark.range(0, 12)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("int").alias("bucket"),
            F.date_add(F.lit("2024-01-01").cast("date"),
                       (F.col("id") % 2).cast("int")).alias("day"),
        )
        .coalesce(1)
    )
    write_delta(df, t, partition_by=["bucket", "day"])
    out = _drain(
        spark,
        read_deltalite_stream(spark, t),
        str(tmp_path / "ck"),
        str(tmp_path / "sink"),
    )
    assert dict(out.dtypes)["bucket"] == "int"
    assert dict(out.dtypes)["day"] == "date"
    got = {(r.id, r.bucket, r.day) for r in out.collect()}
    want = {
        (
            i,
            i % 3,
            datetime.date(2024, 1, 1) + datetime.timedelta(days=i % 2),
        )
        for i in range(12)
    }
    assert got == want


def test_cdf_stream_across_dml_hand_computed(spark, tmp_path):
    """Verdict r9 item 6: stream a table's change feed ACROSS a DML
    rewrite commit, hand-computed feed.  Drain 1 sees the two appends;
    drain 2 (same checkpoint) must deliver exactly the UPDATE's change
    pair: every pre-DML row of the touched file as 'delete' and the
    rewritten rows as 'insert' — nothing from versions 0-1 again."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import update_delta

    t, ckpt, sink = (str(tmp_path / p) for p in ("t", "ck", "sink"))
    write_delta(_df(spark, 0, 4), t)                 # v0: ids 0-3
    write_delta(_df(spark, 4, 6), t, mode="append")  # v1: ids 4-5

    def drain():
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

    drain()
    got1 = {
        (r.id, r.v, r._commit_version, r._change_type)
        for r in spark.read.parquet(sink).collect()
    }
    assert got1 == {(i, i * 2, 0 if i < 4 else 1, "insert") for i in range(6)}

    update_delta(spark, t, "id = 5", {"v": "999"})  # v2 rewrites v1's file
    drain()
    new = {
        (r.id, r.v, r._commit_version, r._change_type)
        for r in spark.read.parquet(sink).collect()
    } - got1
    assert new == {
        (4, 8, 2, "delete"),   # pre-DML rows of the touched file
        (5, 10, 2, "delete"),
        (4, 8, 2, "insert"),   # rewritten survivors
        (5, 999, 2, "insert"),
    }


def test_stream_mapped_partitioned_table(spark, tmp_path):
    """Round 14 (CM × partitions): the streaming source reconstructs
    partition columns of a MAPPED partitioned table — partitionValues
    are keyed by physical name in the log."""
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        write_delta_mapped,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_stream import (
        read_deltalite_stream,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(
        spark.range(0, 8).select(
            F.col("id"),
            (F.col("id") * 2).alias("v"),
            (F.col("id") % 2).cast("string").alias("side"),
        ),
        t,
        partition_by=["side"],
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
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
    rows = {r.id: r.side for r in spark.read.parquet(sink).collect()}
    assert sorted(rows) == list(range(8))
    assert all(rows[i] == str(i % 2) for i in rows)
