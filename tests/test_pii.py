"""PII scrub: hostile-placement detection/redaction exactness and the
map-only plan shape (q225's corpus hash covers the injected lanes;
these pin boundary semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark import plans
from pyspark_anomaly_detection_spark.text.pii import pii_counts, redact_pii

CASES = [
    (1, "mail me at a.b-c_d%e+f@sub.domain.org today", 1, 0, 0,
     "mail me at [EMAIL] today"),
    (2, "call 555-123-4567 or 555-000-1111.", 0, 2, 0,
     "call [PHONE] or [PHONE]."),
    (3, "host 192.168.1.254 and 10.0.0.1:8080", 0, 0, 2,
     "host [IP] and [IP]:8080"),
    # phone-lookalike inside a longer digit run must NOT match (\b)
    (4, "serial 9555-123-45678", 0, 0, 0, "serial 9555-123-45678"),
    # ip-lookalike with a trailing digit segment boundary
    (5, "v1.2.3.4beta", 0, 0, 0, "v1.2.3.4beta"),
    # mixed: email containing digits, then an ip
    (6, "x9@y.io at 8.8.8.8", 1, 0, 1, "[EMAIL] at [IP]"),
    (7, "clean text with no pii at all", 0, 0, 0,
     "clean text with no pii at all"),
]


def test_detection_and_redaction_exact(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in CASES], ["id", "text"]
    ).select(
        "id",
        *pii_counts(F.col("text")),
        redact_pii(F.col("text")).alias("red"),
    )
    got = {r.id: r for r in df.collect()}
    for i, _t, ne, np_, ni, red in CASES:
        r = got[i]
        assert (r.n_email, r.n_phone, r.n_ip) == (ne, np_, ni), i
        assert r.red == red, (i, r.red)


def test_q225_plan_is_map_only_until_sort(spark, sf_dir):
    from pyspark_anomaly_detection_spark.registry import all_queries

    df = all_queries()["q225_pii_redaction"].fn(spark, sf_dir)
    import re

    plan = plans.formatted_plan(df)
    assert not plans.has_python_eval(df), plan
    # one scan, no joins/aggregates — the only exchange is the output sort
    assert len(re.findall(r"^\s*\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Join" not in plan, plan
