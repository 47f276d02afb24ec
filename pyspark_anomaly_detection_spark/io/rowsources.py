"""Row-oriented text sources: JSON Lines and native XML.

LLM-scale corpora arrive overwhelmingly as JSONL (Common Crawl derived
sets, instruction data, API dumps) and occasionally as XML (Wikipedia
dumps, patent corpora).  Spark reads both natively — JSONL since
forever, XML built in since Spark 4 (the spark-xml package was folded
into core) — so the engine's job is to pin the semantics that matter at
ingest time:

* schema-enforced reads (never ``inferSchema`` over 100 TB — inference
  is a full extra pass);
* PERMISSIVE mode with ``columnNameOfCorruptRecord`` so malformed lines
  land in a quarantine column instead of killing the job or silently
  disappearing (the reference's CSV quarantine contract,
  src/data/bronze.py, applied to the JSON lane);
* byte-exact value round trips through the writer/reader pair,
  including escaping.

Both lanes are proven by round-trip censuses against a DuckDB oracle
that never sees the intermediate files: documents → write → read →
aggregate must hash-match the same aggregate computed straight from the
parquet table, plus an exactly-counted corrupt-quarantine row.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark_anomaly_detection_spark.io.detach import detach_local
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Malformed lines injected into the JSONL read path — completely
#: unparseable on purpose, so PERMISSIVE fills every data column with
#: NULL and only the corrupt-record column is populated.
_CORRUPT_LINES = ["not json at all", "{{{", '{"doc_id": ']

_CENSUS_ORACLE = """
    WITH good AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc,
             CAST(MAX(doc_id) AS BIGINT) AS max_doc
      FROM documents GROUP BY lang
    )
    SELECT * FROM good
    {corrupt_row}
    ORDER BY lang
"""


def _doc_read_schema() -> StructType:
    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )


def _census(back: DataFrame) -> DataFrame:
    """Per-lang census over a PERMISSIVE read: corrupt rows (data columns
    all NULL, quarantine column populated) are grouped under the
    '__corrupt__' lang so the quarantine COUNT itself is oracle-checked."""
    key = F.when(
        F.col("_corrupt_record").isNotNull(), F.lit("__corrupt__")
    ).otherwise(F.col("lang"))
    return (
        back.groupBy(key.alias("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("text")).alias("text_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


def _detach(result: DataFrame) -> DataFrame:
    """Materialize a small result before its temp source dir is removed."""
    return detach_local(result)


@register(
    "q216_jsonl_source_census",
    oracle=_CENSUS_ORACLE.format(
        corrupt_row=(
            "UNION ALL SELECT '__corrupt__', "
            f"{len(_CORRUPT_LINES)}, "
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"
        )
    ),
)
def q216_jsonl_source_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingest lane: documents → gzipped JSON Lines (the de-facto
    LLM corpus interchange format) → schema-enforced PERMISSIVE read
    with corrupt-record capture → per-lang census.  Three unparseable
    lines are injected into the files; they must surface as EXACTLY the
    '__corrupt__' quarantine row (count 3, all data columns NULL) while
    every real row round-trips byte-exactly — the oracle aggregates the
    parquet table directly and adds the constant quarantine row, so a
    green hash proves JSON escaping, gzip codec handling, and the
    quarantine contract at once."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    base = tempfile.mkdtemp(prefix="jsonl_src_")
    path = os.path.join(base, "docs")
    try:
        docs.write.option("compression", "gzip").json(path)
        with gzip.open(
            os.path.join(path, "part-zz-corrupt.json.gz"), "wt"
        ) as f:
            for line in _CORRUPT_LINES:
                f.write(line + "\n")
        back = (
            spark.read.schema(_doc_read_schema())
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
        return _detach(_census(back))
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q217_xml_source_census",
    oracle=_CENSUS_ORACLE.format(corrupt_row=""),
)
def q217_xml_source_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML lane (Spark 4 built-in, rowTag-based): documents →
    XML files → schema-enforced read → per-lang census.  XML entity
    escaping (&, <, >) and surrounding-space handling are where naive
    pipelines corrupt text; the round-trip census hash against the
    parquet-direct oracle proves values survive exactly.
    ``ignoreSurroundingSpaces`` is disabled on read so the text column
    is byte-preserved rather than trimmed."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    base = tempfile.mkdtemp(prefix="xml_src_")
    path = os.path.join(base, "docs")
    try:
        docs.write.format("xml").option("rowTag", "doc").save(path)
        back = (
            spark.read.format("xml")
            .schema(
                StructType(
                    [f for f in _doc_read_schema() if f.name != "_corrupt_record"]
                )
            )
            .option("rowTag", "doc")
            .option("ignoreSurroundingSpaces", "false")
            .load(path)
        )
        return _detach(
            _census(back.withColumn("_corrupt_record", F.lit(None).cast("string")))
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
