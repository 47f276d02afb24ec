"""canonical_url / canonical_url_sql twins: engine agreement on an
adversarial battery, idempotence, and the collapse census invariants."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import (
    canonical_url,
    canonical_url_sql,
)

BATTERY = [
    "https://Docs.Example.com/a/5?x=1&y=2",
    "https://docs.example.com:443/a/5?y=2&x=1",
    "HTTPS://docs.example.com/a/./5?x=1&y=2#frag",
    "https://docs.example.com//a//5?x=1&y=2",
    "https://docs.example.com/a/5/?x=1&y=2",
    "https://docs.example.com/a/5?x=1&y=2&",
    "http://Host.tld:80/",
    "http://host.tld",                      # empty path -> /
    "https://h/p/./././q",                  # stacked dot segments
    "https://h/p/.",                        # trailing /.
    "https://h/?b=2&a=1&a=0",               # duplicate param names sort
    "https://h/deep///x//./y/?z=9#top",
    "https://h:443/a?x=%20y",               # encoded char passes through
    "https://h/a?only=1#x?fake=2",          # ? inside fragment
]


def test_twins_agree_on_battery(spark):
    got_spark = [
        r.c
        for r in spark.createDataFrame([(u,) for u in BATTERY], ["u"])
        .select(canonical_url(F.col("u")).alias("c"))
        .collect()
    ]
    got_duck = [
        duckdb.sql(
            f"SELECT {canonical_url_sql('u')} FROM (SELECT ? AS u)",
            params=[u],
        ).fetchone()[0]
        for u in BATTERY
    ]
    assert got_spark == got_duck


def test_canonicalization_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in BATTERY], ["u"])
    once = df.select(canonical_url(F.col("u")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c2"), "c")
    assert all(r.c == r.c2 for r in twice.collect())


def test_expected_canonical_values(spark):
    df = spark.createDataFrame([(u,) for u in BATTERY[:6]], ["u"])
    got = {r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()}
    assert got == {"https://docs.example.com/a/5?x=1&y=2"}
    df2 = spark.createDataFrame([(BATTERY[6],), (BATTERY[7],)], ["u"])
    got2 = [r.c for r in df2.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got2 == ["http://host.tld/", "http://host.tld/"]
