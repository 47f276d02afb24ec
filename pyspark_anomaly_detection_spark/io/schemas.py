"""Explicit schemas — enforced at read time, never inferred.

The transaction schema mirrors the reference's fixed declaration
(reference ``src/data/schemas.py:8-28``): 18 business columns plus a
``_corrupt_record`` quarantine column, with nullability contracts.  Schemas
are declared once here and passed to every scan so CSV parsing is
single-pass (no inference scan) and malformed rows are quarantined rather
than failing the job.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Timestamp format used by the raw CSV feed (reference src/data/ingestion.py:73)
RAW_TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

CORRUPT_RECORD_COL = "_corrupt_record"


def _fields(*, with_corrupt: bool, strict_nulls: bool) -> list[StructField]:
    nn = not strict_nulls  # nullable flag for contract columns
    fields = [
        StructField("transaction_id", StringType(), False),
        StructField("timestamp", TimestampType(), nn or False),
        StructField("sender_account", StringType(), nn),
        StructField("receiver_account", StringType(), nn),
        StructField("amount", DoubleType(), nn),
        StructField("transaction_type", StringType(), nn),
        StructField("merchant_category", StringType(), nn),
        StructField("location", StringType(), nn),
        StructField("device_used", StringType(), nn),
        StructField("is_fraud", BooleanType(), nn),
        StructField("fraud_type", StringType(), True),
        StructField("time_since_last_transaction", DoubleType(), True),
        StructField("spending_deviation_score", DoubleType(), True),
        StructField("velocity_score", IntegerType(), True),
        StructField("geo_anomaly_score", DoubleType(), True),
        StructField("payment_channel", StringType(), True),
        StructField("ip_address", StringType(), True),
        StructField("device_hash", StringType(), True),
    ]
    if with_corrupt:
        fields.append(StructField(CORRUPT_RECORD_COL, StringType(), True))
    return fields


#: Strict schema with quarantine column (reference src/data/schemas.py:8-28)
TRANSACTION_SCHEMA = StructType(_fields(with_corrupt=True, strict_nulls=True))

#: Lax schema for the legacy ingest path (reference src/data/ingestion.py:13-32)
RAW_TRANSACTION_SCHEMA = StructType(_fields(with_corrupt=False, strict_nulls=False))
