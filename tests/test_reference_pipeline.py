"""End-to-end Medallion pipeline parity against hand-computed expectations.

Replays the reference's bronze→silver→features→gold semantics
(SURVEY.md §2 / FIXTURES.md §A) on a deterministic synthetic CSV fixture
with deliberate malformed rows, and checks every layer against independent
pandas recomputations.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.pipeline.medallion import (
    PipelinePaths,
    run_full_pipeline,
    silver_expectations,
)
from pyspark_anomaly_detection_spark.pipeline.fixtures import make_fixture_csv
from pyspark_anomaly_detection_spark.quality.gates import enforce

N_CLEAN = 1200
N_CORRUPT = 7
CUTOFF = datetime(2023, 10, 20, 12, 0, 0)


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("medallion")
    csv_path = str(root / "raw.csv")
    expected = make_fixture_csv(csv_path, n_clean=N_CLEAN, n_corrupt=N_CORRUPT)
    stats = run_full_pipeline(spark, csv_path, str(root / "data"))
    return expected, stats, PipelinePaths(str(root / "data"))


def test_quarantine_and_counts(pipeline_run):
    expected, stats, _ = pipeline_run
    assert stats["quarantined_rows"] == N_CORRUPT
    assert stats["bronze_rows"] == N_CLEAN
    n_train_expected = int((expected["timestamp"] < CUTOFF).sum())
    assert stats["train_rows"] == n_train_expected
    assert stats["test_rows"] == N_CLEAN - n_train_expected


def test_silver_derived_columns(spark, pipeline_run):
    expected, _, paths = pipeline_run
    silver = (
        spark.read.parquet(paths.silver_train)
        .unionByName(spark.read.parquet(paths.silver_test))
        .select(
            "transaction_id",
            "timestamp",
            "txn_hour",
            "txn_day_of_week",
            "is_weekend",
            "label",
            "fraud_type",
        )
        .toPandas()
        .set_index("transaction_id")
        .sort_index()
    )
    exp = expected.set_index("transaction_id").sort_index()
    assert (silver["txn_hour"] == exp["timestamp"].dt.hour).all()
    # Spark dayofweek: Sunday=1..Saturday=7; pandas dayofweek: Monday=0
    expected_dow = (exp["timestamp"].dt.dayofweek + 1) % 7 + 1
    assert (silver["txn_day_of_week"] == expected_dow).all()
    assert (silver["is_weekend"] == expected_dow.isin([1, 7]).astype(int)).all()
    assert (silver["label"] == exp["is_fraud"].astype(int)).all()
    assert (silver["fraud_type"] == exp["fraud_type"].fillna("none")).all()


def test_behavioral_features_brute_force(spark, pipeline_run):
    _, _, paths = pipeline_run
    feats = (
        spark.read.parquet(paths.features_train)
        .select(
            "transaction_id",
            "sender_account",
            "receiver_account",
            "timestamp",
            "amount",
            "velocity_1h",
            "avg_diff_24h",
            "merchant_diversity",
        )
        .toPandas()
    )
    # brute-force recompute per row over the same (train) rows
    by_sender = {k: g for k, g in feats.groupby("sender_account")}
    for _, row in feats.sample(n=150, random_state=7).iterrows():
        grp = by_sender[row["sender_account"]]
        t = row["timestamp"]
        w1 = grp[(grp["timestamp"] >= t - timedelta(hours=1)) & (grp["timestamp"] <= t)]
        w24 = grp[(grp["timestamp"] >= t - timedelta(hours=24)) & (grp["timestamp"] <= t)]
        w6 = grp[(grp["timestamp"] >= t - timedelta(hours=6)) & (grp["timestamp"] <= t)]
        assert row["velocity_1h"] == len(w1), row["transaction_id"]
        assert row["merchant_diversity"] == w6["receiver_account"].nunique()
        expected_diff = row["amount"] - w24["amount"].mean()
        assert abs(row["avg_diff_24h"] - expected_diff) < 1e-9


def test_gold_daily_recompute(spark, pipeline_run, duck):
    _, _, paths = pipeline_run
    daily = spark.read.parquet(paths.gold_daily).toPandas()
    silver = (
        spark.read.parquet(paths.silver_train)
        .unionByName(spark.read.parquet(paths.silver_test))
        .select("timestamp", "label", "amount")
        .toPandas()
    )
    silver["d"] = silver["timestamp"].dt.date
    grouped = silver.groupby("d")
    assert len(daily) == len(grouped)
    exp = grouped.agg(n=("label", "size"), fraud=("label", "sum")).reset_index()
    merged = daily.merge(exp, left_on="ingestion_date", right_on="d")
    assert (merged["total_transactions"] == merged["n"]).all()
    assert (merged["fraud_cases"] == merged["fraud"]).all()
    assert (
        (merged["fraud_rate"] - (merged["fraud"] / merged["n"]).round(4)).abs() < 1e-12
    ).all()


def test_dq_gate_raises_on_violation(spark):
    bad = spark.createDataFrame(
        [("T1", -5.0, 3, 1), ("T2", 10.0, 99, 0)],
        "transaction_id string, amount double, txn_hour int, label int",
    )
    with pytest.raises(ValueError, match="amount_out_of_range"):
        enforce(bad, silver_expectations()[1:])


def test_write_audit_publish_gates_bad_data(spark, tmp_path):
    """WAP: audit metrics observed during the write pass gate publication —
    good batch publishes atomically, bad batch leaves the previous table
    untouched with staging kept for inspection."""
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.quality.wap import audited_write

    path = str(tmp_path / "gold")
    metrics = {
        "n": F.count(F.lit(1)),
        "n_null_amount": F.count(F.when(F.col("amount").isNull(), 1)),
        "min_amount": F.min("amount"),
    }
    expectations = {
        "n": lambda v: v and v > 0,
        "n_null_amount": lambda v: v == 0,
        "min_amount": lambda v: v is not None and v >= 0,
    }

    good = spark.range(100).select(
        "id", (F.col("id") % 7).cast("double").alias("amount")
    )
    r1 = audited_write(good, path, metrics, expectations)
    assert r1.published and r1.metrics["n"] == 100 and not r1.failures
    assert spark.read.parquet(path).count() == 100

    bad = spark.range(50).select(
        "id",
        F.when(F.col("id") == 13, None).otherwise(F.lit(-1.0)).alias("amount"),
    )
    r2 = audited_write(bad, path, metrics, expectations)
    assert not r2.published
    assert len(r2.failures) == 2  # null amount + negative min
    # previous table untouched; rejected batch inspectable in staging
    assert spark.read.parquet(path).count() == 100
    assert spark.read.parquet(path + "__staging").count() == 50


def test_run_pipeline_cli(tmp_path, spark):
    """The root CLI (the reference's run_pipeline.py equivalent) completes
    ingest→silver→features→gold from a generated fixture and reports
    consistent stage stats."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_pipeline_cli", os.path.join(root, "run_pipeline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stats = mod.main(["--out", str(tmp_path), "--rows", "400", "--skip-ml"])
    assert stats["bronze_rows"] == 400
    assert stats["quarantined_rows"] == 7
    assert stats["train_rows"] + stats["test_rows"] == 400


def test_behavioral_frame_edge_modes(spark):
    """Frame-edge semantics flag: the default microsecond frames and the
    reference's seconds-truncated frames (src/features/build_features.py:
    26-33) disagree exactly on rows 1h ± sub-second apart — hand-computed.

    t0 = 10:00:00.500; t1 = 11:00:00.200 (3599.7s later, 3600s after
    truncation).  Micros mode: t0 is INSIDE t1's 1h frame (velocity 2).
    Seconds mode: truncated gap is exactly 3600s → also inside (range
    includes the bound) — so use t1b = 11:00:01.200 where micros gap
    3600.7s (outside) but truncated gap 3601 (outside too); the divergent
    case is t0=10:00:00.900, t1=11:00:00.100: micros gap 3599.2 (inside),
    truncated gap 3600 (inside, boundary); and t0=10:00:00.100,
    t1=11:00:00.900: micros gap 3600.8 (OUTSIDE), truncated 3600 (INSIDE).
    That last pair is the observable divergence.
    """
    from pyspark_anomaly_detection_spark.windows.features import (
        with_behavioral_features,
    )

    rows = [
        ("u1", "2023-10-01 10:00:00.100", 10.0, "a"),
        ("u1", "2023-10-01 11:00:00.900", 20.0, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts string, value double, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))

    micros = with_behavioral_features(df).orderBy("ts").collect()
    secs = with_behavioral_features(df, truncate_to_seconds=True).orderBy("ts").collect()

    # micros: gap is 3600.8s > 1h, so the second row's 1h frame holds only itself
    assert [r.velocity_1h for r in micros] == [1, 1]
    # seconds-truncated (reference): gap truncates to exactly 3600s == bound → included
    assert [r.velocity_1h for r in secs] == [1, 2]


def test_medallion_on_deltalite_matches_parquet(spark, tmp_path):
    """Reference parity: the reference writes silver/gold as DELTA
    (src/data/silver.py:56-59, src/data/gold.py:57-60).  Running the
    whole medallion with table_format='deltalite' must produce the same
    silver/gold contents as the parquet run, with the transactional
    extras on top: per-table history and a versioned overwrite when the
    gold stage reruns."""
    from pyspark_anomaly_detection_spark.io.deltalite import (
        delta_history,
        read_delta,
    )
    from pyspark_anomaly_detection_spark.pipeline.medallion import (
        PipelinePaths,
        gold_aggregations,
    )

    csv_path = str(tmp_path / "raw.csv")
    make_fixture_csv(csv_path, n_clean=400, n_corrupt=3)
    p_stats = run_full_pipeline(spark, csv_path, str(tmp_path / "pq"))
    d_stats = run_full_pipeline(
        spark, csv_path, str(tmp_path / "dl"), table_format="deltalite"
    )
    assert p_stats == d_stats

    pq = PipelinePaths(str(tmp_path / "pq") )
    dl = PipelinePaths(str(tmp_path / "dl"), "deltalite")

    def rows(df, key):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple(str(x) for x in t),
        )

    for pq_path, dl_path in (
        (pq.silver_train, dl.silver_train),
        (pq.gold_daily, dl.gold_daily),
        (pq.gold_hourly, dl.gold_hourly),
    ):
        a = spark.read.parquet(pq_path)
        b = read_delta(spark, dl_path).select(*a.columns)
        assert rows(a, None) == rows(b, None), dl_path

    # rerunning gold = a transactional overwrite: version 1, history kept
    gold_aggregations(spark, dl)
    hist = delta_history(dl.gold_daily)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["operation"] == "OVERWRITE" and hist[1]["n_removes"] > 0
    assert rows(read_delta(spark, dl.gold_daily), None) == rows(
        spark.read.parquet(pq.gold_daily), None
    )
