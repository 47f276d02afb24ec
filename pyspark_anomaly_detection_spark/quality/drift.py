"""Distribution-drift monitors — the checks a training pipeline runs
before trusting a new data window against the window the model was fit on.

* q163 — PSI (population stability index) of ``events.value`` between the
  first and second half of the month, over fixed bin edges.  PSI =
  Σ (p−q)·ln(p/q) is THE standard feature-drift gate in fraud/credit
  scoring; >0.2 conventionally means "retrain".
* q164 — categorical frequency drift of ``event_type`` (chi-square-style
  components, log-free so every column is an exact single division).

Reference parity: the reference validates only schema/nulls
(src/utils/data_quality.py:14-49); drift monitoring is the natural
extension of its quality layer for a production anomaly pipeline
(SURVEY §2.11 quality gates).

Oracle notes: bin edges are literals (no quantile pass), counts are exact
BIGINTs, and every ratio is one division of exact operands, identical in
both engines.  The hashed outputs are deliberately LOG-FREE: JVM
``Math.log`` and glibc ``log`` disagree by one ulp on some inputs (the
BM25 query's probe pinned a concrete case), so the ln-carrying PSI
scalar is computed by :func:`psi_from_components` from the exact per-bin
components instead of inside the hashed query.

Scale notes: both queries are single-scan conditional aggregations (one
shuffle each, map-side partial aggs); the bin assignment is a codegen'd
CASE chain, no UDF.  At 100 TB the same plan holds — drift monitors are
exactly the kind of always-on query that must stay one-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

#: Fixed bin edges for events.value (domain ≈ [0, 500]); literal so both
#: engines bin identically with zero extra passes.
VALUE_BIN_EDGES = [5.0, 15.0, 30.0, 50.0, 75.0, 110.0, 160.0, 230.0, 330.0]

SPLIT_TS = "2024-01-16 00:00:00"


def _bin_expr(col: str):
    """0-based bin index via a codegen'd CASE chain over the fixed edges."""
    expr = F.lit(len(VALUE_BIN_EDGES))
    for i in reversed(range(len(VALUE_BIN_EDGES))):
        expr = F.when(F.col(col) < VALUE_BIN_EDGES[i], F.lit(i)).otherwise(expr)
    return expr


def _bin_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} < {e} THEN {i}" for i, e in enumerate(VALUE_BIN_EDGES)
    )
    return f"CASE {whens} ELSE {len(VALUE_BIN_EDGES)} END"


@register(
    "q163_psi_value_drift",
    oracle=f"""
    WITH binned AS (
      SELECT
        {_bin_case_sql("value")} AS bin_id,
        CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END AS is_base
      FROM events
    ),
    counts AS (
      SELECT
        bin_id,
        CAST(SUM(is_base) AS BIGINT) AS base_n,
        CAST(SUM(1 - is_base) AS BIGINT) AS new_n
      FROM binned GROUP BY bin_id
    ),
    totals AS (
      SELECT CAST(SUM(base_n) AS DOUBLE) AS base_t,
             CAST(SUM(new_n) AS DOUBLE) AS new_t
      FROM counts
    )
    SELECT
      bin_id,
      base_n,
      new_n,
      CAST(base_n AS DOUBLE) / NULLIF(base_t, 0) AS p_base,
      CAST(new_n AS DOUBLE) / NULLIF(new_t, 0) AS p_new,
      (CAST(base_n AS DOUBLE) / NULLIF(base_t, 0))
        / NULLIF(CAST(new_n AS DOUBLE) / NULLIF(new_t, 0), 0) AS odds_ratio
    FROM counts, totals
    ORDER BY bin_id
    """,
)
def q163_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin PSI components of events.value, first half of the month
    (base) vs second half (new).  Single scan → conditional counts per
    bin → exact divisions; the global totals ride a tiny cross-joined
    single-row aggregate (broadcast, no second scan of the fact)."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        _bin_expr("value").alias("bin_id"),
        F.when(F.col("ts") < F.lit(SPLIT_TS).cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_base"),
    )
    counts = binned.groupBy("bin_id").agg(
        F.sum("is_base").alias("base_n"),
        F.sum(F.lit(1) - F.col("is_base")).alias("new_n"),
    )
    totals = counts.agg(
        F.sum("base_n").cast("double").alias("base_t"),
        F.sum("new_n").cast("double").alias("new_t"),
    )
    p_base = F.try_divide(F.col("base_n").cast("double"), F.col("base_t"))
    p_new = F.try_divide(F.col("new_n").cast("double"), F.col("new_t"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin_id",
            "base_n",
            "new_n",
            p_base.alias("p_base"),
            p_new.alias("p_new"),
            F.try_divide(p_base, p_new).alias("odds_ratio"),
        )
        .orderBy("bin_id")
    )


def psi_from_components(rows) -> float:
    """Σ (p_base − p_new)·ln(p_base/p_new) over q163's per-bin rows —
    the PSI scalar, computed with glibc ``math.log`` from the exact
    components (kept out of the hashed query because JVM ``Math.log``
    is not ulp-identical to libm).  ``rows`` is any iterable of objects
    with ``p_base`` / ``p_new`` attributes (Spark Row included)."""
    import math

    return sum(
        (r.p_base - r.p_new) * math.log(r.p_base / r.p_new)
        for r in rows
        if r.p_base > 0 and r.p_new > 0
    )


@register(
    "q164_categorical_drift",
    oracle=f"""
    WITH counts AS (
      SELECT
        event_type,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END)
             AS BIGINT) AS base_n,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '{SPLIT_TS}' THEN 0 ELSE 1 END)
             AS BIGINT) AS new_n
      FROM events GROUP BY event_type
    ),
    totals AS (
      SELECT CAST(SUM(base_n) AS DOUBLE) AS base_t,
             CAST(SUM(new_n) AS DOUBLE) AS new_t
      FROM counts
    )
    SELECT
      event_type,
      base_n,
      new_n,
      CAST(base_n AS DOUBLE) / NULLIF(base_t, 0) AS p_base,
      CAST(new_n AS DOUBLE) / NULLIF(new_t, 0) AS p_new,
      CAST(new_n AS DOUBLE) / NULLIF(new_t, 0) - CAST(base_n AS DOUBLE) / NULLIF(base_t, 0)
        AS share_delta
    FROM counts, totals
    ORDER BY event_type
    """,
)
def q164_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical share drift of event_type across the two halves —
    log-free (every output is an exact single division / subtraction), so
    it stays bitwise-comparable on any platform."""
    ev = load_table(spark, sf_dir, "events")
    split = F.col("ts") < F.lit(SPLIT_TS).cast("timestamp")
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(split, 1).otherwise(0)).alias("base_n"),
        F.sum(F.when(split, 0).otherwise(1)).alias("new_n"),
    )
    totals = counts.agg(
        F.sum("base_n").cast("double").alias("base_t"),
        F.sum("new_n").cast("double").alias("new_t"),
    )
    p_base = F.try_divide(F.col("base_n").cast("double"), F.col("base_t"))
    p_new = F.try_divide(F.col("new_n").cast("double"), F.col("new_t"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            "base_n",
            "new_n",
            p_base.alias("p_base"),
            p_new.alias("p_new"),
            (p_new - p_base).alias("share_delta"),
        )
        .orderBy("event_type")
    )
