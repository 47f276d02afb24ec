"""CHECK constraints on deltalite: metadata-stored predicates enforced
on every write and DML rewrite, protocol-upgraded to writer v3,
existing-data validation at ADD time, NULL-fails-closed semantics,
survival through schema evolution, and clean DROP."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    delta_history,
    read_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
    DeltaliteConstraintViolation,
    add_check_constraint,
    check_constraints_of,
    drop_check_constraint,
)
from pyspark_anomaly_detection_spark.io.deltalite_dml import (
    merge_delta,
    update_delta,
)


def _t(spark, tmp_path, n=10):
    t = str(tmp_path / "t")
    write_delta(
        spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v")), t
    )
    return t


def test_add_constraint_stores_config_and_upgrades_protocol(spark, tmp_path):
    from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state

    t = _t(spark, tmp_path)
    v = add_check_constraint(spark, t, "v_even", "v % 2 = 0")
    assert v == 1
    snap = _snapshot_state(t)
    assert check_constraints_of(snap.meta) == {"v_even": "v % 2 = 0"}
    assert snap.protocol["minWriterVersion"] >= 3


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(DeltaliteConstraintViolation, match="v_small"):
        add_check_constraint(spark, t, "v_small", "v < 10")
    # failed ADD commits nothing
    assert len(delta_history(t)) == 1


def test_append_violating_batch_rejected_atomically(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    bad = spark.range(100, 105).select(
        F.col("id"), (-F.col("id")).alias("v")
    )
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        write_delta(bad, t, mode="append")
    # nothing leaked: same rows, same history length
    assert read_delta(spark, t).count() == 10
    assert len(delta_history(t)) == 2
    # a clean batch still lands
    good = spark.range(100, 105).select(F.col("id"), F.col("id").alias("v"))
    write_delta(good, t, mode="append")
    assert read_delta(spark, t).count() == 15


def test_null_result_fails_closed(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        spark.range(3).select(F.col("id"), F.col("id").cast("long").alias("v")),
        t,
    )
    add_check_constraint(spark, t, "v_pos", "v >= 0")
    with_null = spark.range(3, 5).select(
        F.col("id"), F.lit(None).cast("long").alias("v")
    )
    with pytest.raises(DeltaliteConstraintViolation, match="v_pos"):
        write_delta(with_null, t, mode="append")


def test_update_violating_constraint_rejected(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "v_cap", "v <= 100")
    with pytest.raises(DeltaliteConstraintViolation, match="v_cap"):
        update_delta(spark, t, "id >= 5", {"v": "v + 1000"})
    # rewrite aborted: all original values intact
    assert sorted(r.v for r in read_delta(spark, t).collect()) == [
        i * 2 for i in range(10)
    ]
    # an in-bounds update passes
    update_delta(spark, t, "id = 5", {"v": "99"})
    assert read_delta(spark, t).filter("id = 5").first().v == 99


def test_merge_insert_violating_constraint_rejected(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    src = spark.range(8, 12).select(
        F.col("id"), (-F.lit(1)).cast("long").alias("v")
    )
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        merge_delta(spark, t, src, key="id")
    assert read_delta(spark, t).count() == 10


def test_constraint_survives_schema_evolution(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    write_delta(
        spark.range(10, 12).select(
            F.col("id"), F.col("id").alias("v"), F.lit("x").alias("tag")
        ),
        t,
        mode="append",
        merge_schema=True,
    )
    # the evolved metaData kept the configuration: still enforced
    with pytest.raises(DeltaliteConstraintViolation, match="v_nonneg"):
        write_delta(
            spark.range(12, 13).select(
                F.col("id"), (-F.lit(5)).cast("long").alias("v"), F.lit("y").alias("tag")
            ),
            t,
            mode="append",
        )


def test_drop_constraint_lifts_enforcement(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    drop_check_constraint(spark, t, "v_nonneg")
    write_delta(
        spark.range(10, 12).select(F.col("id"), (-F.lit(1)).cast("long").alias("v")),
        t,
        mode="append",
    )
    assert read_delta(spark, t).count() == 12
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(spark, t, "v_nonneg")


def test_partition_column_predicate_rejected_at_add(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    write_delta(df, t, partition_by=["p"])
    with pytest.raises(ValueError, match="data columns"):
        add_check_constraint(spark, t, "p_zero", "p = '0'")


def test_bad_sql_rejected_at_add(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="data columns"):
        add_check_constraint(spark, t, "bad", "no_such_col > 0")


def test_duplicate_name_rejected(spark, tmp_path):
    t = _t(spark, tmp_path)
    add_check_constraint(spark, t, "c1", "v >= 0")
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, t, "c1", "v >= 1")


def test_add_constraint_rejects_partition_columns(spark, tmp_path):
    """ADVICE r13: constraints reference DATA columns only — the
    staged-file rewrite check reads data files (no partition columns),
    so a predicate over a partition column must refuse cleanly at ADD
    time, never die later inside a partitioned DML commit."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.deltalite import write_delta
    from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta

    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 8).select(
            F.col("id"), (F.col("id") % 2).cast("string").alias("side")
        ),
        t,
        partition_by=["side"],
    )
    with pytest.raises(ValueError, match="data columns"):
        add_check_constraint(spark, t, "side_ok", "side IN ('0','1')")
    # data-column constraints still work on the partitioned table, and
    # partitioned DML enforces them on the staged rewrite
    add_check_constraint(spark, t, "id_nonneg", "id >= 0")
    delete_delta(spark, t, "id = 3")
