"""Dataset diagnostics: single-pass table profiling and key-skew analysis.

The reference's data-quality layer is assertion-shaped (GX expectations,
src/utils/data_quality.py:29-36 → q39's violation counters).  A training-
data platform also needs the *descriptive* counterpart: per-column
profiles (null rate, cardinality, range) to spot drift, and per-key
frequency profiles to choose a shuffle strategy (plain hash vs salting vs
AQE skew splits) BEFORE launching the 100 TB join.

Both operators are one aggregation pass each:

* ``profile_table`` computes every column's stats in a single ``agg`` (one
  scan, map-side combined) and unpivots driver-side — the stats row is a
  few KB regardless of table size.
* the skew profile is the classic two-level aggregation (key → count,
  count → frequency-of-frequency) — each level map-side combinable, and
  the second input is |distinct keys|, not |rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan column profile: for each column — row count, null count,
    exact distinct count, min/max (as strings, type-erased) and average
    string length (exact: bigint char sum / count).

    All columns' aggregates run in the SAME ``agg`` (one scan).  The
    unpivot to one-row-per-column happens on the single result row, so
    plan size grows with column count, data size doesn't matter.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__nonnull"),
            F.countDistinct(col).alias(f"{c}__distinct"),
            F.min(col.cast("string")).alias(f"{c}__min"),
            F.max(col.cast("string")).alias(f"{c}__max"),
            F.sum(F.length(col.cast("string"))).alias(f"{c}__charsum"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nonnull")).alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
            (
                F.col(f"{c}__charsum").cast("double")
                / F.col(f"{c}__nonnull").cast("double")
            ).alias("avg_len"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


def _q112_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
          COUNT(*) AS n_rows,
          COUNT(*) - COUNT({c}) AS n_nulls,
          COUNT(DISTINCT {c}) AS n_distinct,
          MIN(CAST({c} AS VARCHAR)) AS min_str,
          MAX(CAST({c} AS VARCHAR)) AS max_str,
          CAST(CAST(SUM(length(CAST({c} AS VARCHAR))) AS BIGINT) AS DOUBLE)
            / CAST(COUNT({c}) AS DOUBLE) AS avg_len
        FROM documents
        """
        for c in PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register("q112_table_profile", oracle=_q112_oracle())
def q112_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the documents table: every column's null/cardinality/range/
    length stats from ONE scan (the oracle needs five scans — the unpivot
    trick is the Spark-side win)."""
    return profile_table(
        load_table(spark, sf_dir, "documents"), list(PROFILE_COLS)
    )


@register(
    "q113_key_skew_profile",
    oracle="""
    WITH key_counts AS (
      SELECT o_custkey AS key, COUNT(*) AS per_key
      FROM orders GROUP BY o_custkey
    ),
    freq AS (
      SELECT per_key, COUNT(*) AS n_keys
      FROM key_counts GROUP BY per_key
    ),
    totals AS (
      SELECT CAST(MAX(per_key) AS BIGINT) AS max_per_key,
             CAST(SUM(per_key * n_keys) AS BIGINT) AS n_rows
      FROM freq
    )
    SELECT CAST(f.per_key AS BIGINT) AS per_key,
      CAST(f.n_keys AS BIGINT) AS n_keys,
      CAST(f.per_key * f.n_keys AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
        AS row_share,
      CASE WHEN f.per_key = t.max_per_key THEN 1 ELSE 0 END AS is_heaviest
    FROM freq f, totals t
    ORDER BY per_key
    """,
)
def q113_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequency profile of a join/shuffle key: how many keys
    carry how many rows, each cohort's share of the table, and the
    heaviest cohort flagged.  This is the decision input for plain hash vs
    salted shuffle (relational/skew.py) — a top-cohort share near 1/
    partition-count means salting is mandatory.  Two cascaded map-side-
    combinable aggregations; the global totals are a 1-row broadcast."""
    ord_ = load_table(spark, sf_dir, "orders")
    key_counts = ord_.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("per_key")
    )
    freq = key_counts.groupBy("per_key").agg(F.count("*").alias("n_keys"))
    totals = freq.agg(
        F.max("per_key").alias("max_per_key"),
        F.sum(F.col("per_key") * F.col("n_keys")).alias("n_rows"),
    )
    return (
        freq.crossJoin(F.broadcast(totals))
        .select(
            "per_key",
            "n_keys",
            (
                (F.col("per_key") * F.col("n_keys")).cast("double")
                / F.col("n_rows").cast("double")
            ).alias("row_share"),
            F.when(F.col("per_key") == F.col("max_per_key"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_heaviest"),
        )
        .orderBy("per_key")
    )


N_CHECKSUM_BUCKETS = 64
DRIFT_MOD = 9973  # rows dropped from the B side to simulate drift


def table_fingerprint(
    df: DataFrame, cols: list[str], n_buckets: int = N_CHECKSUM_BUCKETS
) -> DataFrame:
    """Order-independent per-bucket fingerprint: md5-derived 60-bit row
    digest (md5 is engine-identical, unlike xxhash64/murmur), bucketed by
    digest mod n, reduced with COUNT + BIT_XOR (exact, commutative — no
    accumulation-order dependence).  Comparing two tables is then a
    64-row join of fingerprints, not a data move: the reconciliation
    primitive for prod-vs-replica checks at 100 TB.  Fully map-side
    combinable; one shuffle of n_buckets × partials."""
    from pyspark_anomaly_detection_spark.functions import md5_long60

    row_str = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols]
    )
    digest = md5_long60(row_str)
    return (
        df.select(
            F.pmod(digest, F.lit(n_buckets)).alias("bucket"), digest.alias("digest")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.bit_xor("digest").alias("xor_sig"))
    )


_CHECKSUM_COLS_SQL = (
    "COALESCE(CAST(l_orderkey AS VARCHAR), '∅') || '|' || "
    "COALESCE(CAST(l_linenumber AS VARCHAR), '∅') || '|' || "
    "COALESCE(l_returnflag, '∅') || '|' || "
    "COALESCE(strftime(l_shipdate, '%Y-%m-%d'), '∅')"
)


def _q117_oracle() -> str:
    digest = f"CAST(('0x' || substr(md5({_CHECKSUM_COLS_SQL}), 1, 15)) AS BIGINT)"
    return f"""
    WITH rows_a AS (
      SELECT {digest} AS digest FROM lineitem
    ),
    rows_b AS (
      SELECT {digest} AS digest FROM lineitem WHERE l_orderkey % {DRIFT_MOD} <> 0
    ),
    fp_a AS (
      SELECT digest % {N_CHECKSUM_BUCKETS} AS bucket, COUNT(*) AS n_a,
             bit_xor(digest) AS xor_a
      FROM rows_a GROUP BY bucket
    ),
    fp_b AS (
      SELECT digest % {N_CHECKSUM_BUCKETS} AS bucket, COUNT(*) AS n_b,
             bit_xor(digest) AS xor_b
      FROM rows_b GROUP BY bucket
    )
    SELECT fp_a.bucket AS bucket, n_a, COALESCE(n_b, 0) AS n_b,
      CASE WHEN n_a = COALESCE(n_b, 0) AND xor_a = COALESCE(xor_b, 0)
           THEN 1 ELSE 0 END AS is_match
    FROM fp_a LEFT JOIN fp_b ON fp_a.bucket = fp_b.bucket
    ORDER BY bucket
    """


@register("q117_table_checksum_diff", oracle=_q117_oracle())
def q117_table_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two table versions by fingerprint: B simulates drift
    (a deterministic slice of orders missing); the 64-bucket comparison
    localizes every divergence without shuffling either table's rows.
    Buckets whose digests all survived unchanged report is_match=1 — at
    scale, only mismatched buckets need row-level investigation."""
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "shipdate_str"]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("shipdate_str"),
    )
    fa = table_fingerprint(li, cols).withColumnRenamed("n", "n_a").withColumnRenamed(
        "xor_sig", "xor_a"
    )
    fb = (
        table_fingerprint(
            li.filter(F.pmod(F.col("l_orderkey"), F.lit(DRIFT_MOD)) != 0), cols
        )
        .withColumnRenamed("n", "n_b")
        .withColumnRenamed("xor_sig", "xor_b")
    )
    return (
        fa.join(fb, "bucket", "left")
        .select(
            "bucket",
            "n_a",
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.when(
                (F.col("n_a") == F.coalesce("n_b", F.lit(0)))
                & (F.col("xor_a") == F.coalesce("xor_b", F.lit(0))),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("is_match"),
        )
        .orderBy("bucket")
    )


CDC_SPLIT = "2000-06-01 00:00:00"  # snapshot B = orders before this date
CDC_PRICE_BUMP_MOD = 101  # every 101st order's price "changed" in B


@register(
    "q133_snapshot_cdc_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice FROM orders
    ),
    snap_b AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % {CDC_PRICE_BUMP_MOD} = 0
             THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{CDC_SPLIT}'
    ),
    classified AS (
      SELECT
        CASE
          WHEN b.o_orderkey IS NULL THEN 'added'
          WHEN a.o_orderkey IS NULL THEN 'removed'
          WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
          ELSE 'unchanged'
        END AS change_type,
        COALESCE(a.o_orderkey, b.o_orderkey) AS key
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n,
      CAST(MIN(key) AS BIGINT) AS min_key
    FROM classified
    GROUP BY change_type
    ORDER BY change_type
    """,
)
def q133_snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two table snapshots: full outer
    join on the key classifies every row as added / removed / changed /
    unchanged — the row-level complement of q117's bucket fingerprints
    (fingerprints find WHICH buckets drifted cheaply; this query explains
    drift row-by-row).  Snapshot B is derived deterministically (a date
    cutoff drops rows → 'added' in A's direction; a keyed price bump →
    'changed').  One shuffle on the join key; the classification is a
    projection; at 100 TB run it per fingerprint-flagged partition, not
    on the whole table."""
    ord_ = load_table(spark, sf_dir, "orders")
    snap_a = ord_.select("o_orderkey", "o_totalprice")
    snap_b = ord_.filter(
        F.col("o_orderdate") < F.lit(CDC_SPLIT).cast("timestamp")
    ).select(
        "o_orderkey",
        F.when(
            F.pmod(F.col("o_orderkey"), F.lit(CDC_PRICE_BUMP_MOD)) == 0,
            F.col("o_totalprice") + 1.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a = snap_a.select(
        F.col("o_orderkey").alias("a_key"), F.col("o_totalprice").alias("a_price")
    )
    b = snap_b.select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    classified = a.join(b, a["a_key"] == b["b_key"], "full_outer").select(
        F.when(F.col("b_key").isNull(), "added")
        .when(F.col("a_key").isNull(), "removed")
        .when(F.col("a_price") != F.col("b_price"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce("a_key", "b_key").alias("key"),
    )
    return (
        classified.groupBy("change_type")
        .agg(F.count("*").alias("n"), F.min("key").alias("min_key"))
        .orderBy("change_type")
    )
