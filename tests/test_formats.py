"""Source/sink format breadth: JSON and ORC round-trips through the
pluggable writers (the reference is CSV/Delta/Parquet-only; SURVEY §2.1
notes no other connectors — these close the common-format gap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.io.writers import write_table


def _fingerprint(df):
    return (
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("h"),
        ).collect()[0]
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_json")
    orders = load_table(spark, sf_dir, "orders")
    write_table(orders, out, fmt="json")
    # schema must be supplied on read (JSON would otherwise infer and widen)
    back = spark.read.schema(orders.schema).json(out)
    assert _fingerprint(back) == _fingerprint(orders)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem")
    write_table(li, out, fmt="orc")
    back = spark.read.orc(out)
    assert back.schema == li.schema
    assert _fingerprint(back) == _fingerprint(li)


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lineitem_orc_pd")
    li = load_table(spark, sf_dir, "lineitem")
    write_table(li, out, fmt="orc")
    plan = (
        spark.read.orc(out)
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_quantity" in plan

def test_python_datasource_partition_invariance(spark):
    """The custom Python DataSource must yield the identical row set at
    any partition fan-out (exactly-once per id-range slice)."""
    from pyspark_anomaly_detection_spark.io.pydatasource import (
        register_python_datasource,
    )

    register_python_datasource(spark)

    def rows(parts):
        return sorted(
            tuple(r)
            for r in spark.read.format("synthetic_events")
            .option("rows", 1000)
            .option("partitions", parts)
            .load()
            .collect()
        )

    one = rows(1)
    assert len(one) == 1000
    assert rows(7) == one
    assert rows(32) == one


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Readers must tolerate schema drift across partition batches —
    the batch-append analog of the reference's overwriteSchema Delta
    option (SURVEY §2.1 S7): older files simply surface NULL for columns
    they predate."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(3).select("id").write.mode("append").parquet(base)
    spark.range(3, 6).select(
        "id", (F.col("id") * 2).alias("extra")
    ).write.mode("append").parquet(base)

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in merged.collect()}
    assert len(rows) == 6
    assert rows[1] is None and rows[4] == 8


def test_operators_tolerate_empty_input(spark, sf_dir):
    """Window/agg/dedup operators must return empty results (same schema),
    not crash, when a filter eliminates every row — the behavior a
    date-partition miss produces in production."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.events.analytics import sessionize
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.quality.profile import profile_table
    from pyspark_anomaly_detection_spark.text.dedup import exact_dedup

    empty_ev = load_table(spark, sf_dir, "events").filter(F.lit(False))
    assert sessionize(empty_ev).count() == 0

    empty_docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    assert exact_dedup(empty_docs).count() == 0

    prof = profile_table(empty_docs, ["doc_id", "text"]).collect()
    assert {r.col_name for r in prof} == {"doc_id", "text"}
    assert all(r.n_rows == 0 for r in prof)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    """50 tiny ingest files → a handful of size-targeted files, bitwise
    row parity, and sorted-within-file layout for min/max pruning."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.maintenance import (
        compact_parquet,
        parquet_file_count,
    )

    path = str(tmp_path / "smallfiles")
    # simulate 50 micro-batch appends
    spark.range(50_000).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(1000)).alias("k")
    ).repartition(50).write.mode("overwrite").parquet(path)
    assert parquet_file_count(spark, path) == 50
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id"), F.count("*")).first()

    n_files = compact_parquet(
        spark, path, target_file_bytes=256 * 1024, sort_by=["k"]
    )
    assert parquet_file_count(spark, path) == n_files < 50

    after = spark.read.parquet(path)
    assert after.agg(F.sum("id"), F.count("*")).first() == before_sum
    # Range-partitioned sorted rewrite: each file covers a DISJOINT
    # k-range (file boundaries from the range partitioner are strict),
    # unlike the round-robin input layout where every file spans the
    # whole 0..999 domain. The partitioner samples its split points, so
    # the ranges need not be *even* — asserting evenness is flaky
    # (observed 561/1000 on a 2-file sampled boundary); disjointness is
    # the deterministic property min/max pruning actually relies on.
    ranges = sorted(
        after.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect(),
        key=lambda r: r.lo,
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev.hi < cur.lo, [(r.lo, r.hi) for r in ranges]
    # and no single file covers (nearly) the whole domain — that would
    # mean the sort/range step silently degraded to round-robin
    assert len(ranges) >= 2
    assert max(r.hi - r.lo for r in ranges) < 900, [
        (r.lo, r.hi) for r in ranges
    ]


def test_compaction_survives_stale_leftovers(spark, tmp_path):
    """A crashed prior run leaves __compact/__old behind; Hadoop rename
    would return false against an existing dest (silently, not raising) —
    the swap must clear leftovers first and still publish correctly."""
    import os

    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.maintenance import compact_parquet

    path = str(tmp_path / "tbl")
    spark.range(10_000).withColumn("k", F.col("id") % 7).repartition(10).write.parquet(
        path
    )
    # stale dirs from a "crashed" prior run
    os.makedirs(path + "__compact/junk")
    os.makedirs(path + "__old/junk")

    before = spark.read.parquet(path).agg(F.sum("id"), F.count("*")).first()
    compact_parquet(spark, path, target_file_bytes=1024 * 1024)
    assert spark.read.parquet(path).agg(F.sum("id"), F.count("*")).first() == before
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__compact")


def test_wap_republish_over_stale_old(spark, tmp_path):
    """audited_write over an existing table with a stale __old dir: the
    publish must still swap (rename returns are checked, stale dir cleared)
    and the new version must be the one readers see."""
    import os

    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.quality.wap import audited_write

    path = str(tmp_path / "wap_tbl")
    metrics = {"n": F.count(F.lit(1))}
    expectations = {"n": lambda v: v and v > 0}

    r1 = audited_write(spark.range(100), path, metrics, expectations)
    assert r1.published
    os.makedirs(path + "__old/junk")  # stale from a crashed prior publish

    r2 = audited_write(spark.range(250), path, metrics, expectations)
    assert r2.published and r2.metrics["n"] == 250
    assert spark.read.parquet(path).count() == 250
    assert not os.path.exists(path + "__old")


def test_zstd_parquet_roundtrip(spark, tmp_path):
    """Compression codec is a write option, not a schema property: zstd
    files read back identically (codec choice is the storage-efficiency
    lever at 100 TB — zstd ≈ 30% smaller than snappy at similar speed)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "zstd_table")
    df = spark.range(10_000).select(
        "id", F.sha2(F.col("id").cast("string"), 256).alias("payload")
    )
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.min("id"), F.max("id")).first() == (0, 9_999)
    part = [str(p) for p in __import__("pathlib").Path(path).glob("*.parquet")]
    assert part and all(".zstd." in p for p in part)


def test_delete_keys_rewrites_only_touched_partitions(spark, tmp_path):
    """GDPR-style targeted deletion: rows for the requested keys vanish,
    untouched partitions keep their files byte-for-byte (mtime check),
    and a fully-emptied partition's directory is removed."""
    import os

    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.maintenance import delete_keys

    path = str(tmp_path / "facts_by_day")
    # day 1: users 1,2,3 · day 2: users 4,5 (untouched) · day 3: user 9 only
    rows = (
        [(1, "d1", i) for i in range(10)]
        + [(2, "d1", i) for i in range(5)]
        + [(3, "d1", i) for i in range(5)]
        + [(4, "d2", i) for i in range(7)]
        + [(5, "d2", i) for i in range(3)]
        + [(9, "d3", i) for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["user_id", "day", "v"])
    df.write.partitionBy("day").parquet(path)
    n_before = spark.read.parquet(path).count()
    # materialize expectations BEFORE the rewrite (the old files vanish)
    doomed = {1, 9}
    survivors = {
        (r.user_id, r.day, r.v)
        for r in spark.read.parquet(path).collect()
        if r.user_id not in doomed
    }

    keys = spark.createDataFrame([(1,), (9,)], ["user_id"])
    d2_mtime = os.path.getmtime(os.path.join(path, "day=d2"))

    stats = delete_keys(spark, path, ["day"], "user_id", keys)

    after = spark.read.parquet(path)
    assert stats == {"partitions_rewritten": 2, "rows_deleted": 14}
    assert after.count() == n_before - 14
    assert after.join(keys, "user_id", "left_semi").count() == 0
    # survivors are exactly the non-doomed rows
    got = {(r.user_id, r.day, r.v) for r in after.collect()}
    assert got == survivors
    # day=d3 (only doomed rows) is gone entirely
    assert not os.path.exists(os.path.join(path, "day=d3"))
    # day=d2 (no doomed rows) was never rewritten
    assert os.path.getmtime(os.path.join(path, "day=d2")) == d2_mtime


def test_delete_keys_noop_when_keys_absent(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.maintenance import delete_keys

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["user_id", "day", "v"]
    ).write.partitionBy("day").parquet(path)
    keys = spark.createDataFrame([(42,)], ["user_id"])
    stats = delete_keys(spark, path, ["day"], "user_id", keys)
    assert stats == {"partitions_rewritten": 0, "rows_deleted": 0}
    assert spark.read.parquet(path).count() == 2


def test_merge_keys_upsert_update_insert_and_move(spark, tmp_path):
    """Delta-MERGE semantics on plain Parquet: matched keys updated
    (including one whose partition value CHANGES — old home purged, new
    home written), unmatched keys inserted, untouched partitions keep
    their files byte-for-byte."""
    import os

    from pyspark_anomaly_detection_spark.io.maintenance import merge_keys

    path = str(tmp_path / "dim_by_day")
    base = spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)],
        ["user_id", "day", "v"],
    )
    base.write.partitionBy("day").parquet(path)
    d3_mtime = os.path.getmtime(os.path.join(path, "day=d3"))

    updates = spark.createDataFrame(
        [
            (1, "d1", 11),   # in-place update
            (3, "d1", 31),   # key MOVES d2 -> d1
            (7, "d2", 70),   # insert into existing partition
            (8, "d4", 80),   # insert into brand-new partition
        ],
        ["user_id", "day", "v"],
    )
    stats = merge_keys(spark, path, ["day"], "user_id", updates)
    assert stats == {
        "partitions_rewritten": 3,  # d1 (update+move-in), d2 (move-out+insert), d4 (new)
        "rows_updated": 2,
        "rows_inserted": 2,
    }
    got = {
        (r.user_id, r.day, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "d1", 11),
        (2, "d1", 20),
        (3, "d1", 31),
        (7, "d2", 70),
        (4, "d3", 40),
        (8, "d4", 80),
    }
    # key 3 no longer lives in d2
    assert (3, "d2", 30) not in got
    # untouched d3 was never rewritten
    assert os.path.getmtime(os.path.join(path, "day=d3")) == d3_mtime


def test_merge_keys_rejects_ambiguous_updates(spark, tmp_path):
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.io.maintenance import merge_keys

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a", 0)], ["user_id", "day", "v"]).write.partitionBy(
        "day"
    ).parquet(path)
    dup = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2)], ["user_id", "day", "v"]
    )
    with _pytest.raises(ValueError, match="one source row per key"):
        merge_keys(spark, path, ["day"], "user_id", dup)


def test_merge_keys_empty_updates_is_clean_noop(spark, tmp_path):
    """An empty updates frame must be a no-op with all-zero counts, not
    an opaque filter(None) Py4J error, and must leave the table files
    untouched."""
    import os

    from pyspark_anomaly_detection_spark.io.maintenance import merge_keys

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["user_id", "day", "v"]
    )
    base.write.partitionBy("day").parquet(path)
    mtime = os.path.getmtime(os.path.join(path, "day=a"))

    empty = spark.createDataFrame([], base.schema)
    stats = merge_keys(spark, path, ["day"], "user_id", empty)
    assert stats == {
        "partitions_rewritten": 0,
        "rows_updated": 0,
        "rows_inserted": 0,
    }
    assert spark.read.parquet(path).count() == 2
    assert os.path.getmtime(os.path.join(path, "day=a")) == mtime


def test_scd2_apply_close_open_noop_and_replay_idempotent(spark, tmp_path):
    """SCD2 writer: a changed attribute closes the current row at the
    effective ts and opens a new current one; an identical update is a
    no-op; a new key opens its first version; replaying the SAME batch
    changes nothing (idempotent)."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.maintenance import scd2_apply

    path = str(tmp_path / "dim_scd2")
    spark.createDataFrame(
        [
            (1, "gold", "2024-01-01 00:00:00", None),
            (1, "silver", "2023-01-01 00:00:00", "2024-01-01 00:00:00"),
            (2, "bronze", "2024-02-01 00:00:00", None),
            (3, "gold", "2024-03-01 00:00:00", None),
        ],
        "user_id long, tier string, valid_from string, valid_to string",
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [
            (1, "platinum", "2024-06-01 00:00:00"),  # change -> close + open
            (2, "bronze", "2024-06-01 00:00:00"),    # identical -> no-op
            (9, "silver", "2024-06-01 00:00:00"),    # new key -> open
        ],
        "user_id long, tier string, effective_ts string",
    )
    stats = scd2_apply(spark, path, "user_id", ["tier"], updates)
    assert stats == {"rows_closed": 1, "rows_opened": 2, "rows_unchanged": 1}

    t = spark.read.parquet(path)
    cur = {
        (r.user_id, r.tier, r.valid_from)
        for r in t.filter(F.col("valid_to").isNull()).collect()
    }
    assert cur == {
        (1, "platinum", "2024-06-01 00:00:00"),
        (2, "bronze", "2024-02-01 00:00:00"),
        (3, "gold", "2024-03-01 00:00:00"),
        (9, "silver", "2024-06-01 00:00:00"),
    }
    # key 1's old current row is closed exactly at the effective ts
    closed = t.filter(
        (F.col("user_id") == 1) & (F.col("tier") == "gold")
    ).collect()[0]
    assert closed.valid_to == "2024-06-01 00:00:00"
    # full history preserved: 4 original + 2 opened
    assert t.count() == 6

    # replay the same batch: every key now matches its current version
    stats2 = scd2_apply(spark, path, "user_id", ["tier"], updates)
    assert stats2 == {"rows_closed": 0, "rows_opened": 0, "rows_unchanged": 3}
    assert spark.read.parquet(path).count() == 6
