"""deltalite protocol semantics: log replay, time travel, overwrite,
single-writer commit exclusivity, history, and fail-loud on unsupported
protocol features."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.deltalite import (
    delta_history,
    read_delta,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    assert write_delta(_df(spark, 0, 10), t) == 0
    assert write_delta(_df(spark, 10, 15), t, mode="append") == 1
    assert write_delta(_df(spark, 100, 102), t, mode="overwrite") == 2

    assert read_delta(spark, t).count() == 2  # latest = overwrite
    assert read_delta(spark, t, version=0).count() == 10
    assert read_delta(spark, t, version=1).count() == 15
    got = sorted(r.id for r in read_delta(spark, t, version=2).collect())
    assert got == [100, 101]
    # committed schema survives the read
    assert read_delta(spark, t).schema.fieldNames() == ["id", "v"]

    hist = delta_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["operation"] == "OVERWRITE"
    assert hist[2]["n_removes"] > 0 and hist[2]["n_adds"] > 0


def test_commit_exclusivity_single_writer(spark, tmp_path, monkeypatch):
    """Racing writers of the same version must fail on O_EXCL, not
    clobber — simulate a writer whose version listing is stale (the
    other writer committed version 1 after this one planned it)."""
    from pyspark_anomaly_detection_spark.io import deltalite

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 5, 8), t, mode="append")  # the winner's commit 1
    monkeypatch.setattr(deltalite, "_list_versions", lambda p: [0])
    with pytest.raises(FileExistsError):
        write_delta(_df(spark, 8, 12), t, mode="append")


def test_crashed_writer_files_invisible(spark, tmp_path):
    """Data files without a committed add action must not be read —
    the log is the source of truth."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t)
    # orphan parquet dropped into the table dir (simulated crash)
    _df(spark, 90, 99).write.parquet(os.path.join(t, "orphan"))
    assert read_delta(spark, t).count() == 5


def test_unsupported_protocol_fails_loud(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 3), t)
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log0)]
    for a in actions:
        if "protocol" in a:
            a["protocol"]["minReaderVersion"] = 3
    with open(log0, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="reader version"):
        read_delta(spark, t)


def test_missing_table_and_bad_version(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 3), t)
    with pytest.raises(ValueError, match="version 7 not in log"):
        read_delta(spark, t, version=7)
