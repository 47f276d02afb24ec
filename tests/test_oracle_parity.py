"""Oracle-parity harness: mirrors the driver's correctness gate.

For every registered query with an oracle, run the Spark DataFrame program
AND the DuckDB SQL over the same parquet, then compare row count, column
names, and order-insensitive values — EXACTLY (no float tolerance): the
engine's parity conventions are designed to give bitwise-identical doubles.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark_anomaly_detection_spark.registry import all_queries

REGISTRY = all_queries()
ORACLE_CASES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_CASES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything; exact float repr keeps bitwise mismatches visible
    out = df.copy()
    for col in out.columns:
        out[col] = out[col].map(_cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def _cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, duck, sf_dir, name):
    query = REGISTRY[name]
    spark_pdf = query.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(query.oracle).df()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    left = _normalize(spark_pdf)
    right = _normalize(duck_pdf)
    if not left.equals(right):
        diff_mask = (left != right).any(axis=1)
        sample = pd.concat(
            [left[diff_mask].head(5), right[diff_mask].head(5)],
            keys=["spark", "duckdb"],
        )
        raise AssertionError(f"{name}: value mismatch\n{sample}")


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
