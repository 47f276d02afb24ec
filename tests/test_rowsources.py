"""JSONL / XML source lanes: hostile-content round trips and the
PERMISSIVE quarantine contract (q216/q217's census hashes cover the
clean corpus; these pin the escaping edge cases the synthetic corpus
doesn't contain)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_anomaly_detection_spark.io.rowsources import (
    _CORRUPT_LINES,
    _doc_read_schema,
)

NASTY = [
    (1, 'amp & lt < gt > quot " apos \''),
    (2, "newline\nand\ttab"),
    (3, "unicode é中文 \U0001f600"),
    (4, "trailing spaces   "),
    (5, "</doc><doc>injection attempt</doc>"),
    (6, '{"fake": "json"}'),
]

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _frame(spark):
    return spark.createDataFrame(NASTY, SCHEMA).coalesce(1)


def test_jsonl_round_trip_hostile_text(spark, tmp_path):
    path = str(tmp_path / "j")
    _frame(spark).write.json(path)
    back = spark.read.schema(SCHEMA).json(path)
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == dict(NASTY)


def test_jsonl_quarantine_captures_raw_lines(spark, tmp_path):
    path = str(tmp_path / "j")
    _frame(spark).write.json(path)
    with gzip.open(os.path.join(path, "part-zz-corrupt.json.gz"), "wt") as f:
        for line in _CORRUPT_LINES:
            f.write(line + "\n")
    schema = StructType(
        list(SCHEMA) + [StructField("_corrupt_record", StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    rows = back.collect()
    corrupt = [r for r in rows if r._corrupt_record is not None]
    good = [r for r in rows if r._corrupt_record is None]
    # every injected line quarantined verbatim, data columns NULL
    assert sorted(r._corrupt_record for r in corrupt) == sorted(_CORRUPT_LINES)
    assert all(r.doc_id is None and r.text is None for r in corrupt)
    assert {r.doc_id: r.text for r in good} == dict(NASTY)
    # FAILFAST on the same files raises instead of quarantining
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        spark.read.schema(SCHEMA).option("mode", "FAILFAST").json(path).collect()


def test_xml_round_trip_hostile_text(spark, tmp_path):
    path = str(tmp_path / "x")
    _frame(spark).write.format("xml").option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .schema(SCHEMA)
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .load(path)
    )
    got = {r.doc_id: r.text for r in back.collect()}
    # the writer must have entity-escaped <, >, & (row 5 would otherwise
    # truncate at the injected close tag) and preserved unicode + edges
    assert got == dict(NASTY)


def test_registry_schema_matches_lanes():
    names = [f.name for f in _doc_read_schema()]
    assert names == ["doc_id", "lang", "source", "text", "_corrupt_record"]
