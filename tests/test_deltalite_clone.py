"""CLONE on deltalite: zero-copy shallow clones diverge via
copy-on-write without touching the source; deep clones are fully
independent; metadata (constraints, generation exprs, DVs, partition
layout) carries over; source VACUUM is the documented shallow hazard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    read_delta,
    vacuum_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_clone import clone_delta
from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta


def _build(spark, t, n_files=3, width=10):
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


def test_shallow_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src)
    out = clone_delta(src, tgt)
    assert out["files_referenced"] == 3 and out["bytes_copied"] == 0
    # no data files inside the clone directory
    assert _file_bytes(tgt) == {}
    assert sorted(r.id for r in read_delta(spark, tgt).collect()) == list(
        range(30)
    )


def test_shallow_clone_diverges_without_touching_source(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src)
    clone_delta(src, tgt)
    before = _file_bytes(src)
    delete_delta(spark, tgt, "id >= 25")  # rewrites one source-owned file
    assert _file_bytes(src) == before  # source byte-identical
    assert sorted(r.id for r in read_delta(spark, tgt).collect()) == list(
        range(25)
    )
    assert read_delta(spark, src).count() == 30
    # the rewrite materialized INSIDE the clone
    assert len(_file_bytes(tgt)) == 1


def test_clone_of_earlier_version(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src)  # v0..v2
    clone_delta(src, tgt, version=1)
    assert read_delta(spark, tgt).count() == 20


def test_clone_carries_constraints_and_generated(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
        DeltaliteConstraintViolation,
        add_check_constraint,
    )

    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    write_delta(
        spark.range(5).select(F.col("id"), F.col("id").alias("v")),
        src,
        generated_columns={"doubled": "v * 2"},
    )
    add_check_constraint(spark, src, "v_nonneg", "v >= 0")
    clone_delta(src, tgt)
    # generated column materializes on clone appends
    write_delta(
        spark.range(5, 7).select(F.col("id"), F.col("id").alias("v")),
        tgt,
        mode="append",
    )
    got = read_delta(spark, tgt).filter("id >= 5")
    assert sorted((r.id, r.doubled) for r in got.collect()) == [
        (5, 10), (6, 12)
    ]
    # CHECK constraint keeps enforcing on the clone
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        write_delta(
            spark.range(7, 8).select(
                F.col("id"), (-F.lit(1)).cast("long").alias("v")
            ),
            tgt,
            mode="append",
        )


def test_deep_clone_copies_and_survives_source_vacuum(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src)
    out = clone_delta(src, tgt, shallow=False)
    assert out["bytes_copied"] > 0
    assert len(_file_bytes(tgt)) == 3
    # source lifecycle can't hurt a deep clone
    write_delta(
        spark.range(100, 101).select(F.col("id"), F.col("id").alias("v")),
        src,
        mode="overwrite",
    )
    vacuum_delta(src, retain_versions=1)
    assert sorted(r.id for r in read_delta(spark, tgt).collect()) == list(
        range(30)
    )


def test_shallow_clone_breaks_when_source_vacuums(spark, tmp_path):
    """Delta's documented shallow-clone hazard, pinned."""
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src)
    clone_delta(src, tgt)
    write_delta(
        spark.range(100, 101).select(F.col("id"), F.col("id").alias("v")),
        src,
        mode="overwrite",
    )
    vacuum_delta(src, retain_versions=1)  # deletes the files tgt references
    with pytest.raises(Exception):
        read_delta(spark, tgt).count()


def test_clone_onto_existing_table_rejected(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _build(spark, src, n_files=1)
    write_delta(
        spark.range(3).select(F.col("id"), F.col("id").alias("v")), tgt
    )
    with pytest.raises(ValueError, match="already has a log"):
        clone_delta(src, tgt)


def test_clone_partitioned_table(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta(df, src, partition_by=["p"])
    clone_delta(src, tgt)
    got = read_delta(spark, tgt)
    assert got.count() == 20
    assert got.filter(F.col("p") == "0").count() == 10


def test_shallow_clone_of_file_dv_table(spark, tmp_path):
    """Shallow CLONE of a table with file-based ('u') deletion vectors
    (round 13 — was a fail-loud guard): the clone's descriptors rewrite
    to the spec's absolute-path storage ('p'), resolving against the
    SOURCE table's DV file; reads subtract correctly and further DV
    deletes on the clone leave the source untouched."""
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    write_delta(
        spark.range(0, 20).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        src,
    )
    delete_delta_dv(spark, src, "id % 5 = 0", storage="u")
    out = clone_delta(src, tgt, shallow=True)
    assert out["bytes_copied"] == 0
    # the clone reads the same DV-subtracted rows through 'p' descriptors
    from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state

    snap = _snapshot_state(tgt)
    descs = [
        a["deletionVector"]
        for a in snap.adds.values()
        if a.get("deletionVector")
    ]
    assert descs and all(d["storageType"] == "p" for d in descs)
    assert all(d["pathOrInlineDv"].startswith("/") for d in descs)
    got = {r.id for r in read_delta(spark, tgt).collect()}
    assert got == {i for i in range(20) if i % 5 != 0}
    # divergence: a further DV delete on the CLONE only
    delete_delta_dv(spark, tgt, "id = 1")
    assert {r.id for r in read_delta(spark, tgt).collect()} == {
        i for i in range(20) if i % 5 != 0 and i != 1
    }
    assert {r.id for r in read_delta(spark, src).collect()} == {
        i for i in range(20) if i % 5 != 0
    }


def test_deep_clone_of_file_dv_table(spark, tmp_path):
    """Deep CLONE copies the spec-format DV FILE itself (resolved from
    the z85 uuid token — copying the token as a path was a latent
    FileNotFoundError) so the clone is self-contained: deleting the
    source afterwards leaves the clone fully readable."""
    import shutil

    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    write_delta(
        spark.range(0, 20).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        src,
    )
    delete_delta_dv(spark, src, "id % 5 = 0", storage="u")
    out = clone_delta(src, tgt, shallow=False)
    assert out["bytes_copied"] > 0
    shutil.rmtree(src)  # the deep clone must not depend on the source
    got = {r.id for r in read_delta(spark, tgt).collect()}
    assert got == {i for i in range(20) if i % 5 != 0}


def test_merge_on_shallow_clone(spark, tmp_path):
    """ADVICE r13: MERGE's scans mapped scanned files back with
    relpath instead of the resolved-abspath → add-key table, so MERGE
    on a shallow clone (absolute add paths) crashed with a KeyError
    while DELETE/UPDATE worked.  The full clause mix must run on a
    clone and leave the source untouched."""
    from pyspark_anomaly_detection_spark.io.deltalite_dml import merge_delta

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    write_delta(
        spark.range(0, 20)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1),
        src,
    )
    clone_delta(src, tgt)
    source = spark.createDataFrame(
        [(3, 333), (30, 3030)], "id long, v long"
    )
    out = merge_delta(
        spark,
        tgt,
        source,
        key="id",
        not_matched_by_source="delete",
        not_matched_by_source_condition="id >= 15",
    )
    assert out["rows_matched"] == 1 and out["rows_inserted"] == 1
    assert out["rows_deleted_by_source"] == 5
    rows = {r.id: r.v for r in read_delta(spark, tgt).collect()}
    assert sorted(rows) == list(range(15)) + [30]
    assert rows[3] == 333 and rows[30] == 3030
    # source table byte-identical
    assert {r.id for r in read_delta(spark, src).collect()} == set(range(20))
