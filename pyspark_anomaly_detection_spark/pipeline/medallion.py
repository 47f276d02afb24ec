"""Reference-pipeline parity: the Medallion flow, Spark-first.

Re-implements the reference's bronze → silver → features → gold lineage
(``run_pipeline.py:31-64``) with the same semantics but without its
inefficiencies (SURVEY §4.3):

* one PERMISSIVE CSV scan feeding BOTH the clean and quarantine branches
  through a single ``persist()`` (the reference re-scans up to 4×,
  ``src/data/ingestion_pyspark.py:42-48``);
* the silver train/test chronological split persists its parent before the
  two writes (the reference recomputes the full lineage twice,
  ``src/data/silver.py:48-59``);
* the GX expectation suite is replaced by the single-pass native gate
  (``quality.gates``).

Layer semantics mirrored 1:1:

* bronze: ``ingestion_date = to_date(timestamp)`` partition column
  (src/data/ingestion_pyspark.py:51-58), quarantine append sink.
* silver: ``txn_hour``/``txn_day_of_week``/``is_weekend``/``label``/
  ``fraud_type`` null→'none' (src/data/silver.py:32-38), chronological
  split at a cutoff timestamp (src/data/silver.py:44-49).
* features: trailing-window behavioral features (src/features/
  build_features.py:26-39) via ``windows.features.with_behavioral_features``
  — partition ``sender_account``, 1h velocity / 24h avg-diff / 6h
  receiver diversity.
* gold: daily fraud summary + hourly trends (src/data/gold.py:29-53)
  with ``round`` kept for semantic parity with the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import (
    read_csv_permissive,
    split_quarantine,
)
from pyspark_anomaly_detection_spark.io.schemas import TRANSACTION_SCHEMA
from pyspark_anomaly_detection_spark.io.writers import write_partitioned, write_table
from pyspark_anomaly_detection_spark.quality.gates import (
    Expectation,
    enforce,
    expect_between,
    expect_in,
    expect_not_null,
)
from pyspark_anomaly_detection_spark.windows.features import with_behavioral_features

SPLIT_CUTOFF = "2023-10-20 12:00:00"  # reference src/data/silver.py:45


@dataclass
class PipelinePaths:
    root: str
    #: format for the silver/gold/features tables — the reference writes
    #: these as DELTA (src/data/silver.py:56-59, src/data/gold.py:57-60);
    #: "deltalite" reproduces that with the jar-free protocol writer
    #: (transactional overwrites, history, time travel), "parquet" is the
    #: plain default.  Bronze stays hive-partitioned parquet either way
    #: (the dynamic-partition-pruning surface).
    table_format: str = "parquet"
    bronze: str = field(init=False)
    quarantine: str = field(init=False)
    silver_train: str = field(init=False)
    silver_test: str = field(init=False)
    features_train: str = field(init=False)
    features_test: str = field(init=False)
    gold_daily: str = field(init=False)
    gold_hourly: str = field(init=False)

    def __post_init__(self) -> None:
        self.bronze = f"{self.root}/bronze/transactions"
        self.quarantine = f"{self.root}/bronze/quarantine"
        self.silver_train = f"{self.root}/silver/transactions/train"
        self.silver_test = f"{self.root}/silver/transactions/test"
        self.features_train = f"{self.root}/features/transaction_behavioral/train"
        self.features_test = f"{self.root}/features/transaction_behavioral/test"
        self.gold_daily = f"{self.root}/gold/daily_fraud_summary"
        self.gold_hourly = f"{self.root}/gold/hourly_transaction_trends"


def ingest_to_bronze(
    spark: SparkSession, csv_path: str, paths: PipelinePaths
) -> tuple[int, int]:
    """PERMISSIVE ingest with quarantine routing (reference
    src/data/ingestion_pyspark.py:9-66).  Returns (clean, corrupt) counts —
    computed once from a persisted parent, not 4 re-scans."""
    raw = read_csv_permissive(spark, csv_path, TRANSACTION_SCHEMA).persist()
    try:
        clean, corrupt = split_quarantine(raw)
        n_corrupt = corrupt.count()
        if n_corrupt > 0:
            write_table(corrupt, paths.quarantine, mode="append")
        bronze = clean.withColumn("ingestion_date", F.to_date("timestamp"))
        write_partitioned(bronze, paths.bronze, ["ingestion_date"])
        n_clean = spark.read.parquet(paths.bronze).count()
        return n_clean, n_corrupt
    finally:
        raw.unpersist()


def silver_expectations() -> list[Expectation]:
    """The reference's GX suite (src/utils/data_quality.py:29-36) as native
    expectations.  Built lazily — Column construction needs a live session."""
    return [
        expect_not_null("transaction_id"),
        expect_not_null("amount"),
        expect_between("amount", 0, float("inf")),
        expect_between("txn_hour", 0, 23),
        expect_in("label", (0, 1)),
    ]


def read_table(spark: SparkSession, paths: PipelinePaths, path: str):
    """Read a silver/gold/features table in the pipeline's format."""
    if paths.table_format == "deltalite":
        from pyspark_anomaly_detection_spark.io.deltalite import read_delta

        return read_delta(spark, path)
    return spark.read.parquet(path)


def bronze_to_silver(
    spark: SparkSession, paths: PipelinePaths, cutoff: str = SPLIT_CUTOFF
) -> tuple[int, int]:
    """Derived time columns + DQ gate + chronological split (reference
    src/data/silver.py:10-65).  Returns (train, test) row counts."""
    bronze = spark.read.parquet(paths.bronze)
    dow = F.dayofweek("timestamp")
    silver = (
        bronze.withColumn("txn_hour", F.hour("timestamp"))
        .withColumn("txn_day_of_week", dow)
        .withColumn("is_weekend", F.when(dow.isin(1, 7), 1).otherwise(0))
        .withColumn("label", F.col("is_fraud").cast("int"))
        .fillna({"fraud_type": "none"})
    ).persist()
    try:
        enforce(silver, silver_expectations())
        cutoff_ts = F.lit(cutoff).cast("timestamp")
        train = silver.filter(F.col("timestamp") < cutoff_ts)
        test = silver.filter(F.col("timestamp") >= cutoff_ts)
        write_table(train, paths.silver_train, fmt=paths.table_format)
        write_table(test, paths.silver_test, fmt=paths.table_format)
        return train.count(), test.count()
    finally:
        silver.unpersist()


def build_features(spark: SparkSession, paths: PipelinePaths) -> None:
    """Behavioral windows (reference src/features/build_features.py:8-52):
    velocity_1h / avg_diff_24h / merchant_diversity per sender account."""
    for src, dst in (
        (paths.silver_train, paths.features_train),
        (paths.silver_test, paths.features_test),
    ):
        silver = read_table(spark, paths, src)
        feats = with_behavioral_features(
            silver,
            partition_col="sender_account",
            ts_col="timestamp",
            amount_col="amount",
            counterparty_col="receiver_account",
        )
        write_table(feats, dst, fmt=paths.table_format)


def gold_aggregations(spark: SparkSession, paths: PipelinePaths) -> None:
    """Gold daily + hourly summaries (reference src/data/gold.py:20-60).
    ``round`` retained for reference parity (2dp avg amount, 4dp rates)."""
    silver = read_table(spark, paths, paths.silver_train).unionByName(
        read_table(spark, paths, paths.silver_test)
    )
    daily = (
        silver.withColumn("ingestion_date", F.to_date("timestamp"))
        .groupBy("ingestion_date")
        .agg(
            F.count("transaction_id").alias("total_transactions"),
            F.sum("label").alias("fraud_cases"),
            F.round(F.avg("amount"), 2).alias("avg_transaction_amount"),
            F.sum("amount").alias("total_volume"),
        )
        .withColumn(
            "fraud_rate",
            F.round(F.col("fraud_cases") / F.col("total_transactions"), 4),
        )
        .orderBy("ingestion_date")
    )
    hourly = (
        silver.groupBy("txn_hour")
        .agg(
            F.count("transaction_id").alias("txn_count"),
            F.sum("label").alias("fraud_count"),
            F.round(F.avg("spending_deviation_score"), 4).alias("avg_deviation"),
        )
        .orderBy("txn_hour")
    )
    write_table(daily, paths.gold_daily, fmt=paths.table_format)
    write_table(hourly, paths.gold_hourly, fmt=paths.table_format)


def run_full_pipeline(
    spark: SparkSession, csv_path: str, root: str, table_format: str = "parquet"
) -> dict[str, int]:
    """Orchestrate ingest → silver → features → gold (reference
    run_pipeline.py:12-77), state handed between stages through the
    filesystem exactly as the reference does.  ``table_format=
    'deltalite'`` writes silver/features/gold as transactional
    Delta-protocol tables, the reference's configuration."""
    paths = PipelinePaths(root, table_format)
    n_clean, n_corrupt = ingest_to_bronze(spark, csv_path, paths)
    n_train, n_test = bronze_to_silver(spark, paths)
    build_features(spark, paths)
    gold_aggregations(spark, paths)
    return {
        "bronze_rows": n_clean,
        "quarantined_rows": n_corrupt,
        "train_rows": n_train,
        "test_rows": n_test,
    }
