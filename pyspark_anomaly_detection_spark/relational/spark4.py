"""Spark 4 surface: VariantType semi-structured access and SQL pipe syntax.

The reference's data model has no semi-structured columns (SURVEY §1.3 —
all primitives); the harness's ``events.props`` JSON string is the hook.
q08 covers the classic ``get_json_object`` path; q109 covers the Spark 4
``parse_json``/``variant_get`` path, which at scale replaces repeated
string re-parsing with a binary-encoded variant that is parsed once and
field-accessed many times.  q110 exercises the SQL pipe operator surface
(``|>``) — same Catalyst plan as the method-chain form, so it's a parser
check, not an engine fork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


@register(
    "q109_variant_props",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
      CAST(COUNT(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50 THEN 1 END)
           AS BIGINT) AS n_large
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q109_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through VariantType: ``parse_json`` the
    props column once into a variant, then typed ``variant_get`` field
    access feeding integer aggregates.  At 100 TB the variant parse is the
    one expensive pass; every downstream field access is a binary offset
    lookup, not a JSON re-parse (the q08 ``get_json_object`` form re-parses
    per extraction)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_large"),
        )
        .orderBy("event_type")
    )


@register(
    "q110_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q110_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-operator surface (Spark 4 ``|>``): filter → aggregate →
    sort as a linear pipeline.  Catalyst produces the identical plan as
    the method-chain form — this query pins the parser surface the way
    q78-q81 pin the window-SQL surface."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_pipe_orders")
    return spark.sql(
        """
        FROM _pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@register(
    "q119_filter_clause",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n,
      COUNT(*) FILTER (WHERE value > 50.0) AS n_high,
      COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 50.0)
           AS VARCHAR) AS DOUBLE) AS sum_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q119_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregation surface (the SQL form of q48's
    conditional aggregates): identical Catalyst plan to CASE-WHEN inputs,
    pinned here at the parser level.  (QUALIFY is NOT in Spark 4.1's
    grammar — verified; top-k-per-group stays window + filter, q16.)"""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_fc_events")
    return spark.sql(
        """
        SELECT event_type,
          COUNT(*) AS n,
          COUNT(*) FILTER (WHERE value > 50.0) AS n_high,
          COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE value > 50.0)
               AS DOUBLE) AS sum_high
        FROM _fc_events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@register(
    "q120_error_safe_family",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) AS n,
      COUNT(*) - COUNT(TRY_CAST(o_orderstatus AS INT)) AS n_bad_cast,
      CAST(SUM(TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT)) AS BIGINT)
        AS sum_roundtrip,
      COUNT(*) - COUNT(CASE WHEN o_custkey % 3 = 0 THEN NULL
                            ELSE o_totalprice / (o_custkey % 3) END)
        AS n_div_null
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q120_error_safe_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family: ``try_cast`` (malformed → NULL, never a
    task failure) and ``try_divide`` (zero divisor → NULL, never ±inf or
    an ANSI error).  At 100 TB this is the difference between one dirty
    row killing a stage-retry cascade and it landing in a NULL counter —
    the function-level complement of the PERMISSIVE quarantine path (S2).
    The oracle expresses try_divide as a CASE guard because DuckDB's
    float division yields inf on zero."""
    ord_ = load_table(spark, sf_dir, "orders")
    roundtrip = F.col("o_orderkey").cast("string").try_cast("int")
    divided = F.try_divide(
        F.col("o_totalprice"), F.pmod(F.col("o_custkey"), F.lit(3))
    )
    return (
        ord_.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            (
                F.count("*") - F.count(F.col("o_orderstatus").try_cast("int"))
            ).alias("n_bad_cast"),
            F.sum(roundtrip).alias("sum_roundtrip"),
            (F.count("*") - F.count(divided)).alias("n_div_null"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q136_distribute_sort_by",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q136_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY / SORT BY SQL surface — the physical-layout clauses
    (hash-repartition by a key, sort within partitions, no global order):
    the SQL spelling of the compaction layout in io/maintenance.py.  The
    aggregation on top proves the layout clauses don't change semantics;
    the driver's order-insensitive value hash makes the pair
    oracle-checkable even though SORT BY has no global-order guarantee."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_dsb_orders")
    return spark.sql(
        """
        WITH laid_out AS (
          SELECT * FROM _dsb_orders
          DISTRIBUTE BY o_orderstatus SORT BY o_orderstatus, o_orderdate
        )
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM laid_out
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
        """
    )
