"""Native data-quality gates (SURVEY.md §2.11) — no Great Expectations.

The reference runs a GX expectation suite (``src/utils/data_quality.py:6-49``:
columns exist, not-null, ``amount ≥ 0``, ``txn_hour ∈ [0,23]``,
``label ∈ {0,1}``) and a hard-fail null check
(``src/data/ingestion.py:34-50``).  This engine re-implements both as ONE
single-pass aggregation of conditional violation counters — one job, one
scan, map-side combinable — versus the reference's one-action-per-check
pattern that re-scans the input (SURVEY §4.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


@dataclass(frozen=True)
class Expectation:
    """A named violation predicate: rows where ``violated`` is true fail."""

    name: str
    violated: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"{col}_null", F.col(col).isNull())


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"{col}_out_of_range", ~F.col(col).between(lo, hi) | F.col(col).isNull()
    )


def expect_in(col: str, values: tuple) -> Expectation:
    return Expectation(
        f"{col}_invalid", ~F.col(col).isin(*values) | F.col(col).isNull()
    )


def violation_counts(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Single-pass gate: one aggregate with a counter per expectation."""
    return df.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(e.violated, 1).otherwise(0)).alias(e.name)
            for e in expectations
        ],
    )


def enforce(df: DataFrame, expectations: list[Expectation]) -> dict[str, int]:
    """Run the gate and raise ``ValueError`` on any violation (the
    reference's hard-fail contract, src/data/ingestion.py:48,
    src/utils/data_quality.py:43).  Returns the counter dict on success."""
    row = violation_counts(df, expectations).collect()[0].asDict()
    violations = {k: v for k, v in row.items() if k != "n_rows" and v}
    if violations:
        raise ValueError(f"data quality gate failed: {violations}")
    return row


@register(
    "q39_dq_violation_counts",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_null,
      CAST(SUM(CASE WHEN l_quantity IS NULL OR NOT (l_quantity BETWEEN 0 AND 60)
               THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_out_of_range,
      CAST(SUM(CASE WHEN l_discount IS NULL OR NOT (l_discount BETWEEN 0 AND 0.2)
               THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_out_of_range,
      CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')
               THEN 1 ELSE 0 END) AS BIGINT) AS l_returnflag_invalid,
      CAST(SUM(CASE WHEN l_extendedprice IS NULL OR NOT (l_extendedprice BETWEEN 0 AND 1000000)
               THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice_out_of_range
    FROM lineitem
    """,
)
def q39_dq_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectation suite as one scan over lineitem (gate semantics of
    reference src/utils/data_quality.py:29-36, single-pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return violation_counts(
        li,
        [
            expect_not_null("l_quantity"),
            expect_between("l_quantity", 0, 60),
            expect_between("l_discount", 0, 0.2),
            expect_in("l_returnflag", ("A", "N", "R")),
            expect_between("l_extendedprice", 0, 1_000_000),
        ],
    )
