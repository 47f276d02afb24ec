"""TIMESTAMP AS OF on deltalite: in-commit timestamps stamped
monotonically at claim time, history exposure, and version resolution
(latest commit at-or-before the instant; before-earliest raises;
mutually exclusive with VERSION AS OF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    delta_history,
    read_delta,
    version_at_timestamp,
    write_delta,
)


def _build(spark, t, n=3):
    for i in range(n):
        write_delta(
            spark.range(i * 10, (i + 1) * 10).select("id").coalesce(1),
            t,
            mode="append",
        )


def test_in_commit_timestamps_monotonic(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    ts = [h["timestamp"] for h in delta_history(t)]
    assert all(ts[i] < ts[i + 1] for i in range(len(ts) - 1))
    assert all(x > 0 for x in ts)


def test_timestamp_as_of_resolves_between_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    hist = delta_history(t)
    # exactly at a commit → that commit; just before → the prior one
    for h in hist:
        assert version_at_timestamp(t, h["timestamp"]) == h["version"]
    assert version_at_timestamp(t, hist[1]["timestamp"] - 1) == 0
    assert version_at_timestamp(t, hist[-1]["timestamp"] + 10_000) == 2
    got = read_delta(spark, t, timestamp_as_of=hist[1]["timestamp"])
    assert sorted(r.id for r in got.collect()) == list(range(20))


def test_timestamp_before_earliest_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n=1)
    first = delta_history(t)[0]["timestamp"]
    with pytest.raises(ValueError, match="predates"):
        version_at_timestamp(t, first - 1)


def test_version_and_timestamp_mutually_exclusive(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t, n=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_delta(spark, t, version=0, timestamp_as_of=1)


def test_ict_declared_as_table_feature_from_creation(spark, tmp_path):
    """Every deltalite commit is stamped, so the table must DECLARE it
    (VERDICT r11 item 8) in the SPEC's shape (ADVICE r12): commit 0's
    metaData carries delta.enableInCommitTimestamps with NO
    enablement-provenance properties (those are only required when ICT
    is enabled after commit 0, and only as a version+timestamp PAIR);
    every commit's FIRST action is commitInfo carrying the spec's
    inCommitTimestamp field; the declaration survives appends and schema
    evolution (configuration carry-forward); and a table-features
    protocol upgrade (the DV v7 transition) lists inCommitTimestamp in
    writerFeatures."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _read_commit,
        _snapshot_state,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dv import delete_delta_dv

    t = str(tmp_path / "t")
    _build(spark, t, n=3)
    snap0 = _snapshot_state(t)
    conf = snap0.meta["configuration"]
    assert conf["delta.enableInCommitTimestamps"] == "true"
    assert "delta.inCommitTimestampEnablementVersion" not in conf
    assert "delta.inCommitTimestampEnablementTimestamp" not in conf
    # ADVICE r13: the ICT property requires the v7 table-features
    # protocol with 'inCommitTimestamp' in writerFeatures FROM CREATION
    # — a legacy-versioned protocol left foreign writers free to commit
    # without stamping
    assert snap0.protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in snap0.protocol["writerFeatures"]
    assert snap0.protocol["minReaderVersion"] == 1
    assert "readerFeatures" not in snap0.protocol

    # spec: commitInfo is the FIRST action and carries inCommitTimestamp
    for v in (0, 1, 2):
        acts = _read_commit(t, v)
        assert "commitInfo" in acts[0], f"v{v}: commitInfo not first"
        assert isinstance(acts[0]["commitInfo"]["inCommitTimestamp"], int)

    # evolution commit rewrites metaData — the declaration must survive
    write_delta(
        spark.range(100, 103).withColumn("extra", F.lit("x")),
        t,
        mode="append",
        merge_schema=True,
    )
    snap = _snapshot_state(t)
    assert (
        snap.meta["configuration"]["delta.enableInCommitTimestamps"]
        == "true"
    )

    # the v7 table-features upgrade (first DV delete) must list ICT
    delete_delta_dv(spark, t, "id = 0")
    proto = _snapshot_state(t).protocol
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    assert "deletionVectors" in proto["writerFeatures"]


def test_v7_feature_list_tracks_property_and_constraint_adds(
    spark, tmp_path
):
    """Round 14: on a v7 table, enabling a feature-backed property
    (appendOnly, changeDataFeed) or adding a CHECK constraint lists the
    matching writer feature in the same commit — metadata never outruns
    the protocol."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        _snapshot_state,
        set_table_properties,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
        add_check_constraint,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 5).select(F.col("id"), (F.col("id") * 2).alias("v")),
        t,
    )
    set_table_properties(t, {"delta.enableChangeDataFeed": "true"})
    feats = _snapshot_state(t).protocol["writerFeatures"]
    assert "changeDataFeed" in feats
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    snap = _snapshot_state(t)
    assert "checkConstraints" in snap.protocol["writerFeatures"]
    assert snap.protocol["minWriterVersion"] == 7  # stays table-features


def test_dv_upgrade_merges_legacy_features(spark, tmp_path):
    """The DV v7 upgrade of a legacy-versioned table folds in every
    feature the legacy writer version implied (spec's upgrade rule) —
    a mapped (reader-2/writer-5) table keeps columnMapping in BOTH
    feature lists."""
    from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state
    from pyspark_anomaly_detection_spark.io.deltalite_cm import (
        write_delta_mapped,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dv import (
        delete_delta_dv,
    )

    t = str(tmp_path / "t")
    write_delta_mapped(
        spark.range(0, 6).select(F.col("id"), (F.col("id") * 2).alias("v")),
        t,
    )
    delete_delta_dv(spark, t, "id = 2")
    proto = _snapshot_state(t).protocol
    assert proto["minReaderVersion"] == 3
    assert set(proto["readerFeatures"]) == {
        "columnMapping",
        "deletionVectors",
    }
    for feat in (
        "columnMapping",
        "deletionVectors",
        "inCommitTimestamp",
        "checkConstraints",  # implied by legacy writer v5
        "generatedColumns",
        "appendOnly",
    ):
        assert feat in proto["writerFeatures"], feat
