"""detach_local: the fixture-detach rebuild must be correct in BOTH
Arrow and non-Arrow sessions (round-9 driver failure: q216's
'__corrupt__' census row has NULL BIGINTs; toPandas() rendered them as
float NaN and the non-Arrow createDataFrame verifier raised
FIELD_DATA_TYPE_UNACCEPTABLE — CORRECTNESS_r09.json)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_anomaly_detection_spark import plans
from pyspark_anomaly_detection_spark.io.detach import detach_local

ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"

SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("text_bytes", LongType()),
        StructField("ratio", DoubleType()),
    ]
)

ROWS = [
    Row(lang="en", n_docs=4, text_bytes=123, ratio=0.5),
    Row(lang="__corrupt__", n_docs=3, text_bytes=None, ratio=None),
]


@pytest.fixture(params=["true", "false"], ids=["arrow", "no-arrow"])
def arrow_mode(request, spark):
    prev = spark.conf.get(ARROW_CONF)
    spark.conf.set(ARROW_CONF, request.param)
    yield request.param
    spark.conf.set(ARROW_CONF, prev)


def test_null_bigints_survive_detach(spark, arrow_mode):
    src = spark.createDataFrame(ROWS, SCHEMA)
    out = detach_local(src)
    assert out.schema == SCHEMA
    assert sorted(out.collect(), key=lambda r: r.lang) == sorted(
        ROWS, key=lambda r: r.lang
    )


def test_detach_plans_as_jvm_local_scan(spark, arrow_mode):
    """No Python scan in either session mode — the collect()-of-Rows
    rebuild would plan as applySchemaToPythonRDD and break the
    no-Python-eval contract for the oracle queries that detach."""
    out = detach_local(spark.createDataFrame(ROWS, SCHEMA))
    assert not plans.has_python_eval(out)


def test_empty_result_detaches(spark, arrow_mode):
    src = spark.createDataFrame([], SCHEMA).where(F.lit(False))
    out = detach_local(src)
    assert out.schema == SCHEMA
    assert out.count() == 0


def test_q216_census_under_non_arrow_session(spark, sf_dir):
    """End-to-end driver-shaped replay: the exact round-9 failure was
    q216 in a session WITHOUT Arrow.  The census must produce the
    '__corrupt__' row (NULL bigint columns) without raising."""
    # all_queries(), not bare REGISTRY: the dict fills on module import,
    # so a standalone run of this file found it empty (order-dependent)
    from pyspark_anomaly_detection_spark.registry import all_queries

    prev = spark.conf.get(ARROW_CONF)
    spark.conf.set(ARROW_CONF, "false")
    try:
        out = all_queries()["q216_jsonl_source_census"].fn(spark, sf_dir)
        rows = {r.lang: r for r in out.collect()}
    finally:
        spark.conf.set(ARROW_CONF, prev)
    corrupt = rows["__corrupt__"]
    assert corrupt.n_docs == 3
    assert corrupt.text_bytes is None
    assert corrupt.min_doc is None and corrupt.max_doc is None


# ----------------------------------------------------- local_rows_df (r17)


def test_local_rows_df_plans_jvm_local_scan(spark, arrow_mode):
    """The tuple-form createDataFrame plans a Python-RDD scan that pays a
    Python worker round trip PER ACTION (r17: this dominated the
    streaming replays); local_rows_df must plan a JVM LocalTableScan in
    both Arrow and non-Arrow sessions."""
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    df = local_rows_df(
        spark,
        [(1, "a", [1.0, 2.0]), (2, None, None)],
        "id long, s string, v array<double>",
    )
    assert not plans.has_python_eval(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    got = {r.id: (r.s, r.v) for r in df.collect()}
    assert got == {1: ("a", [1.0, 2.0]), 2: (None, None)}


def test_local_rows_df_empty_and_struct_schema(spark, arrow_mode):
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    empty = local_rows_df(spark, [], "id long, s string")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "s"]
    typed = local_rows_df(
        spark, [("x", True)], StructType(
            [StructField("name", StringType()), StructField("ok", __import__("pyspark").sql.types.BooleanType())]
        )
    )
    assert typed.collect()[0].ok is True
