"""Generated columns for deltalite tables (Delta's ``GENERATED ALWAYS
AS (expr)``).

The generation expression is stored per-field in the schemaString's
column metadata under ``delta.generationExpression`` — exactly where
delta-spark keeps it — and the protocol upgrades to ``minWriterVersion
4`` (the version that introduced generated columns).  Semantics match
delta-spark's writer contract:

* a write that OMITS the column gets it materialized from the
  expression (one ``withColumn`` — stays in whole-stage codegen, no
  extra pass);
* a write that PROVIDES the column is checked: every row must satisfy
  ``col <=> (expr)`` (null-safe equality), enforced by the same staged-
  file scan CHECK constraints use — a mismatch aborts the commit
  atomically, because a generated column that can drift from its
  expression is worse than no generated column;
* DML rewrites (UPDATE/MERGE) are enforced the same way — an UPDATE
  that sets a generated column inconsistently aborts.

Generated columns are declared at TABLE CREATION (``write_delta(...,
generated_columns={...})`` on commit 0), like Delta — retrofitting one
onto existing rows would require a table rewrite, which is OPTIMIZE's
job, not a metadata commit's.

Expressions must be deterministic and reference only the row's other
DATA columns (same rule as CHECK constraints; validated at creation).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-field metadata key, byte-compatible with delta-spark
GENERATION_KEY = "delta.generationExpression"


def generated_columns_of(schema_json: "str | None") -> dict[str, str]:
    """``{column: generation_expr}`` from a committed schemaString."""
    if not schema_json:
        return {}
    out = {}
    for field in json.loads(schema_json).get("fields", []):
        expr = (field.get("metadata") or {}).get(GENERATION_KEY)
        if expr:
            out[field["name"]] = expr
    return out


def embed_generation_exprs(
    df: DataFrame, generated: dict[str, str]
) -> tuple[DataFrame, str]:
    """Materialize any missing generated columns on ``df`` and return
    (df, schemaString-with-metadata) for the creation commit."""
    for col, expr in generated.items():
        if col not in df.columns:
            df = df.withColumn(col, F.expr(expr))
    schema = json.loads(df.schema.json())
    for field in schema["fields"]:
        if field["name"] in generated:
            md = dict(field.get("metadata") or {})
            md[GENERATION_KEY] = generated[field["name"]]
            field["metadata"] = md
    return df, json.dumps(schema)


def materialize_generated(
    df: DataFrame, schema_json: "str | None"
) -> DataFrame:
    """Fill in committed generated columns that ``df`` omits (the
    delta-spark writer behavior); provided columns pass through and are
    checked later by :func:`generation_constraints`."""
    for col, expr in generated_columns_of(schema_json).items():
        if col not in df.columns:
            df = df.withColumn(col, F.expr(expr))
    return df


def generation_constraints(schema_json: "str | None") -> dict[str, str]:
    """The enforcement map: each generated column as a null-safe
    equality CHECK predicate, merged into the staged-file scan
    alongside user CHECK constraints."""
    return {
        f"generated:{col}": f"{col} <=> ({expr})"
        for col, expr in generated_columns_of(schema_json).items()
    }


from pyspark.sql import SparkSession  # noqa: E402

from pyspark_anomaly_detection_spark.registry import register  # noqa: E402


@register(
    "q228_deltalite_generated_columns",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)
                    + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS total_text_len
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def q228_deltalite_generated_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Generated-column lifecycle census: the table is created with
    ``text_len GENERATED ALWAYS AS (length(text))`` from half of
    documents (column never provided), the other half appends — also
    without the column, materialized by the writer — and an UPDATE
    appends '!' to every 7th doc's text, which must RECOMPUTE text_len
    through the rewrite.  The final per-source sum of text_len is
    hash-checked against DuckDB computing length(text) (+1 for updated
    docs) directly — a green hash proves creation, append
    materialization, and DML recomputation all track the expression."""
    import os
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import update_delta
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    base = tempfile.mkdtemp(prefix="deltalite_generated_")
    table = os.path.join(base, "docs_t")
    try:
        write_delta(
            docs.filter(F.col("doc_id") % 2 == 0),
            table,
            generated_columns={"text_len": "length(text)"},
        )
        write_delta(docs.filter(F.col("doc_id") % 2 == 1), table, mode="append")
        update_delta(
            spark, table, "doc_id % 7 = 0", {"text": "concat(text, '!')"}
        )
        result = (
            read_delta(spark, table)
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("text_len").alias("total_text_len"),
            )
            .orderBy("source")
        )
        return detach_local(result)  # ≤5 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
