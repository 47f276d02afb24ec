"""Relational breadth: unpivot, ordered string aggregation, array
higher-order functions, generated date spine (gap fill), map functions,
ntile bucketing, full-outer join.

These extend SURVEY.md §2.7/§2.8 beyond the reference's surface (the
reference has no set ops, no string functions, no arrays/maps — SURVEY
§2.8) to the operations a training-data pipeline needs: long/wide reshape,
list aggregation for prompt assembly, vector-column arithmetic without
UDFs, calendar gap-fill for time-series features, and key-reconciliation
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from pyspark_anomaly_detection_spark.functions import dec2, fmt_date, fmt_ts, sum_dbl
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register


# --------------------------------------------------------------------------
# Unpivot (wide → long reshape). Oracle as UNION ALL — portable and
# deterministic; Spark side uses the native unpivot operator.
# --------------------------------------------------------------------------


@register(
    "q54_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT
        l_returnflag,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
        CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_items', n_items FROM wide
    )
    ORDER BY l_returnflag, metric
    """,
)
def q54_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate wide, then unpivot to (key, metric, value) — the reshape
    between feature-store layouts.  Unpivot is a narrow operator (no
    shuffle); the only exchange is the upstream aggregation's."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        sum_dbl("l_quantity").alias("sum_qty"),
        sum_dbl("l_extendedprice").alias("sum_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids="l_returnflag",
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg): sorted-array join — deterministic
# regardless of row arrival order, unlike a bare collect_list.
# --------------------------------------------------------------------------


@register(
    "q55_string_agg",
    oracle="""
    SELECT
      r_name,
      string_agg(n_name, ',' ORDER BY n_name) AS nations,
      COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q55_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Array higher-order functions over the embedding column — JVM-side
# vector arithmetic, no UDFs.  Element counts / extrema are
# order-independent; sum-of-squares is the sequential fold that matches
# DuckDB's list_dot_product bitwise (cf. similarity/ann.py).
# --------------------------------------------------------------------------


@register(
    "q56_array_hof",
    oracle="""
    SELECT
      vec_id,
      len(embedding) AS dim,
      len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
      list_max(embedding::DOUBLE[]) AS max_elem,
      list_min(embedding::DOUBLE[]) AS min_elem,
      list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS sum_sq
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def q56_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.array_max(vec).alias("max_elem"),
        F.array_min(vec).alias("min_elem"),
        F.aggregate(
            F.zip_with(vec, vec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("sum_sq"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Generated date spine + gap fill: sequence → explode → left join → zero
# fill.  The calendar side is generated, tiny, and broadcast — the fact
# side never re-shuffles for the fill.
# --------------------------------------------------------------------------


@register(
    "q57_date_spine_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM bounds
    ),
    actual AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             COUNT(*) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS volume
      FROM orders GROUP BY month
    )
    SELECT
      strftime(spine.month, '%Y-%m-%d') AS month,
      COALESCE(n_orders, 0) AS n_orders,
      COALESCE(volume, 0.0) AS volume
    FROM spine LEFT JOIN actual ON spine.month = actual.month
    ORDER BY month
    """,
)
def q57_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month")
    )
    actual = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        sum_dbl("o_totalprice").alias("volume"),
    )
    return (
        spine.join(actual, "month", "left")
        .select(
            fmt_date("month").alias("month"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("volume", F.lit(0.0)).alias("volume"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Map functions: JSON → typed map, key/value extraction.
# --------------------------------------------------------------------------


@register(
    "q58_map_funcs",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      MIN(json_keys(props)[1]) AS first_key
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q58_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed once into map<string,int>; downstream ops are map
    primitives (map_contains_key / element_at / map_keys) — the pattern for
    semi-structured metadata columns at scale (parse once, prune early)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    parsed = ev.select("event_type", m.alias("m"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.map_contains_key(F.col("m"), "k"), 1).otherwise(0)
            ).alias("n_with_k"),
            F.sum(F.element_at(F.col("m"), "k")).alias("sum_k"),
            F.min(F.element_at(F.map_keys(F.col("m")), 1)).alias("first_key"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# ntile bucketing (equal-frequency binning for feature quantization).
# Unique order key (price, orderkey) → deterministic bucket assignment.
# --------------------------------------------------------------------------


@register(
    "q59_ntile_buckets",
    oracle="""
    WITH binned AS (
      SELECT
        o_totalprice,
        NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT
      bucket,
      COUNT(*) AS n_orders,
      CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
      CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM binned
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q59_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_totalprice", F.ntile(4).over(w).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Training-sequence assembly: per-user chronological event string — the
# pack-examples-into-context op of an LLM data pipeline.  Events are
# collected as (sortable-key, payload) structs, array_sort orders by the
# key (lexicographic on the zero-padded key prefix = chronological),
# then the payloads are joined.  Deterministic regardless of row arrival
# order — the collect_list itself is unordered.
# --------------------------------------------------------------------------


@register(
    "q82_sequence_assembly",
    oracle="""
    SELECT
      user_id,
      string_agg(event_type || '@' || strftime(ts, '%Y-%m-%d %H:%M:%S.%f'),
                 '|' ORDER BY ts, event_id) AS timeline,
      COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q82_sequence_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    entry = F.struct(
        F.unix_micros("ts").alias("k1"),
        F.col("event_id").alias("k2"),
        F.concat_ws("@", "event_type", fmt_ts("ts")).alias("payload"),
    )
    ordered = F.array_sort(F.collect_list(entry))
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s.getField("payload")), "|"
            ).alias("timeline"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# regexp_extract_all + explode: pattern mining over free text.
# --------------------------------------------------------------------------


@register(
    "q83_regex_extract_all",
    oracle="""
    SELECT num, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(regexp_extract_all(text, '[0-9]+')) AS num
      FROM documents
    )
    GROUP BY num
    ORDER BY n DESC, num
    LIMIT 25
    """,
)
def q83_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("num"),
        )
        .groupBy("num")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), F.asc("num"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Null-safe function family: <=>, nullif, nvl, nvl2, coalesce chains.
# --------------------------------------------------------------------------


@register(
    "q84_null_safe_family",
    oracle="""
    SELECT
      event_type,
      CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT DISTINCT FROM '0'
               THEN 1 ELSE 0 END) AS BIGINT) AS k_is_zero_str,
      CAST(SUM(CASE WHEN NULLIF(CAST(json_extract_string(props, '$.k') AS INT), 0)
                    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nullified,
      CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS INT), -1)) AS BIGINT)
        AS k_sum_with_default,
      CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
               THEN 10 ELSE 20 END) AS BIGINT) AS nvl2_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q84_null_safe_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>), NULLIF, COALESCE-with-default, NVL2 —
    the null-handling family beyond q07's fillna/coalesce basics."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k_int = k_str.cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k_str.eqNullSafe(F.lit("0")).cast("int")).alias("k_is_zero_str"),
            F.sum(F.nullif(k_int, F.lit(0)).isNull().cast("int")).alias(
                "k_nullified"
            ),
            F.sum(F.coalesce(k_int, F.lit(-1))).alias("k_sum_with_default"),
            F.sum(F.nvl2(k_str, F.lit(10), F.lit(20))).alias("nvl2_sum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Full-outer join: reconcile two keyed aggregates where either side may
# miss keys (customers vs suppliers per nation).
# --------------------------------------------------------------------------


@register(
    "q60_full_outer_join",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ),
    s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT
      COALESCE(c.nationkey, s.nationkey) AS nationkey,
      COALESCE(n_customers, 0) AS n_customers,
      COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
)
def q60_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )
