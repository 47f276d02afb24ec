"""Deterministic transaction-CSV fixture generator (FIXTURES.md §A1).

Reproduces the reference's raw input shape (`/root/reference/
src/data/schemas.py:8-28`, timestamp format per src/data/ingestion.py:73):
18 business columns, seeded values spanning the chronological split point,
plus deliberately malformed rows (non-numeric amount / unparsable
timestamp) to exercise the PERMISSIVE quarantine path
(src/data/ingestion_pyspark.py:28-44).  Used by both the test suite and
the ``run_pipeline.py`` CLI so they exercise identical data.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

DEFAULT_CLEAN = 1200
DEFAULT_CORRUPT = 7


def make_fixture_csv(
    path: str, n_clean: int = DEFAULT_CLEAN, n_corrupt: int = DEFAULT_CORRUPT
) -> pd.DataFrame:
    """Write a seeded transactions CSV; returns the clean rows as pandas
    for expectation computation."""
    rng = random.Random(42)
    start = datetime(2023, 9, 1)
    rows = []
    for i in range(n_clean):
        ts = start + timedelta(
            seconds=rng.randint(0, 86400 * 90), microseconds=rng.randint(0, 999999)
        )
        is_fraud = rng.random() < 0.03
        rows.append(
            {
                "transaction_id": f"T{100000 + i}",
                "timestamp": ts,
                "sender_account": f"ACC{rng.randint(1, 40):03d}",
                "receiver_account": f"ACC{rng.randint(1, 200):03d}",
                "amount": round(rng.uniform(1, 5000), 2),
                "transaction_type": rng.choice(
                    ["deposit", "withdrawal", "payment", "transfer"]
                ),
                "merchant_category": rng.choice(
                    ["entertainment", "restaurant", "travel", "retail"]
                ),
                "location": rng.choice(["Austin", "Berlin", "Tokyo", "Lima"]),
                "device_used": rng.choice(["mobile", "pos", "web", "atm"]),
                "is_fraud": is_fraud,
                "fraud_type": rng.choice(["card", "account"]) if is_fraud else None,
                "time_since_last_transaction": round(rng.uniform(0, 86400), 1),
                "spending_deviation_score": round(rng.gauss(0, 1), 4),
                "velocity_score": rng.randint(0, 20),
                "geo_anomaly_score": round(rng.random(), 4),
                "payment_channel": rng.choice(["ACH", "card", "UPI", "wire"]),
                "ip_address": f"10.0.{rng.randint(0,255)}.{rng.randint(0,255)}",
                "device_hash": f"D{rng.randint(1000000, 9999999)}",
            }
        )
    pdf = pd.DataFrame(rows)
    header = ",".join(pdf.columns)
    lines = [header]
    for _, r in pdf.iterrows():
        ts = r["timestamp"].strftime("%Y-%m-%dT%H:%M:%S.%f")
        vals = [
            r["transaction_id"],
            ts,
            r["sender_account"],
            r["receiver_account"],
            f'{r["amount"]:.2f}',
            r["transaction_type"],
            r["merchant_category"],
            r["location"],
            r["device_used"],
            str(r["is_fraud"]).lower(),
            "" if r["fraud_type"] is None else r["fraud_type"],
            str(r["time_since_last_transaction"]),
            str(r["spending_deviation_score"]),
            str(r["velocity_score"]),
            str(r["geo_anomaly_score"]),
            r["payment_channel"],
            r["ip_address"],
            r["device_hash"],
        ]
        lines.append(",".join(vals))
    # malformed rows: non-numeric amount or unparsable timestamp
    for j in range(n_corrupt):
        bad = lines[1 + j].split(",")
        if j % 2 == 0:
            bad[4] = "not-a-number"
        else:
            bad[1] = "garbage-timestamp"
        bad[0] = f"TBAD{j}"
        lines.append(",".join(bad))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return pdf
