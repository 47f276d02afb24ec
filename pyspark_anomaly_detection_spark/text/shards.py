"""Data-loader sharding and incremental corpus dedup — the two batch
operators that turn a cleaned corpus into something a 1000-GPU training
job and a daily ingest pipeline can actually consume.

* **Shard manifest** (q168): assign every document to one of N_SHARDS
  shards by content hash — deterministic on any engine/partitioning (the
  same md5-based assignment the split family uses, splits.py docstring),
  no global sort, no global row_number (a global row_number is a single
  task at 100 TB; hash-mod sharding is embarrassingly parallel and keeps
  shards statistically balanced).  The manifest row per shard (doc/token/
  byte totals, id range) is what a data loader reads to plan epochs.

* **Incremental dedup** (q169): dedup a new batch AGAINST the historical
  corpus without recomputing history — the daily-ingest shape: exact
  content digests of the increment anti-joined to the history digest
  set, then within-increment keep-min-id.  Shuffle carries 32-byte
  digests, never text; both classification joins share the digest
  shuffle key.  At 100 TB the history digest set is a bucketed table
  maintained incrementally (io/writers.py::write_bucketed) so the join
  co-locates without re-shuffling history.

Reference parity: the reference has no sharding/incremental layer (its
pipeline is single-batch, run_pipeline.py); these are the beyond-
reference LLM-pipeline operators the brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.functions import MD5_LONG60_SQL, md5_long60
from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register
from pyspark_anomaly_detection_spark.text.dedup import content_digest

N_SHARDS = 16

#: History/increment boundary for the incremental-dedup demonstration:
#: the same stable content-hash bucketing the split family uses, so the
#: halves are deterministic on any engine.
HISTORY_BUCKET_PCT = 50

#: Reserved sentinel standing in for a NULL group key inside the
#: grouped-window machinery's broadcast offset maps (Python renders
#: None as 'None' while Spark's concat_ws SKIPS nulls — without one
#: canonical rendering a null group's ranks come back NULL; nulls fuzz
#: variant, round 16).  A real group value equal to this string is not
#: supported.
NULL_GROUP_KEY = "\x00<null>"

_DIGEST_SQL = "sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"


def shard_assign(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Stable shard id in [0, N_SHARDS) from the key's content hash."""
    return df.withColumn(
        "shard_id", md5_long60(F.col(key_col).cast("string")) % N_SHARDS
    )


@register(
    "q168_shard_manifest",
    oracle=f"""
    SELECT
      ({MD5_LONG60_SQL.format(x="CAST(doc_id AS VARCHAR)")}) % {N_SHARDS}
        AS shard_id,
      COUNT(*) AS n_docs,
      CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS token_sum,
      CAST(SUM(n_chars) AS BIGINT) AS char_sum,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def q168_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest of the hash-sharded corpus: doc/token/char
    totals + id range per shard — one scan, one hash aggregation; the
    assignment itself is oracle-pinned through the totals."""
    docs = shard_assign(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("token_sum"),
            F.sum("n_chars").alias("char_sum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


#: Per-stratum keep rates for the deterministic sampler, in basis points
#: (exact integer thresholds — no float compare ambiguity across engines).
SAMPLE_RATES_BP = {"view": 1000, "click": 5000, "purchase": 10000, "error": 10000, "signup": 2500}


@register(
    "q173_deterministic_stratified_sample",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type, event_id,
             ({MD5_LONG60_SQL.format(x="CAST(event_id AS VARCHAR)")}) % 10000
               AS bp
      FROM events
    )
    SELECT
      event_type,
      COUNT(*) AS n_total,
      CAST(SUM(CASE WHEN bp < CASE event_type
        {" ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_BP.items())}
        ELSE 0 END THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      CAST(MIN(CASE WHEN bp < CASE event_type
        {" ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_BP.items())}
        ELSE 0 END THEN event_id END) AS BIGINT) AS min_sampled_id
    FROM hashed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q173_deterministic_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified sampling the REPRODUCIBLE way: keep a row iff the md5
    hash of its id falls under the stratum's basis-point threshold —
    the same row is kept on any engine, any run, any partitioning, and
    growing the table never resamples existing rows (none of which
    ``sampleBy``'s seeded RNG guarantees; that is why q88 is rows-only
    while THIS query is fully oracle-hashed).  One scan, one hash
    aggregation; the full assignment is pinned through per-stratum
    counts + min sampled id."""
    ev = load_table(spark, sf_dir, "events")
    bp = md5_long60(F.col("event_id").cast("string")) % 10000
    rate = F.lit(0)
    for etype, rate_bp in SAMPLE_RATES_BP.items():
        rate = F.when(F.col("event_type") == etype, F.lit(rate_bp)).otherwise(rate)
    kept = bp < rate
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(kept.cast("long")).alias("n_sampled"),
            F.min(F.when(kept, F.col("event_id"))).alias("min_sampled_id"),
        )
        .orderBy("event_type")
    )


@register(
    "q169_incremental_dedup",
    oracle=f"""
    WITH tagged AS (
      SELECT source, doc_id, {_DIGEST_SQL} AS digest,
             ({MD5_LONG60_SQL.format(x="CAST(doc_id AS VARCHAR)")}) % 100
               < {HISTORY_BUCKET_PCT} AS is_history
      FROM documents
      WHERE text IS NOT NULL
    ),
    hist AS (SELECT DISTINCT digest FROM tagged WHERE is_history),
    inc AS (
      SELECT source, doc_id, digest,
             digest IN (SELECT digest FROM hist) AS vs_history,
             ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rk
      FROM tagged WHERE NOT is_history
    )
    SELECT
      source,
      COUNT(*) AS n_incoming,
      CAST(SUM(CASE WHEN vs_history THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dup_vs_history,
      CAST(SUM(CASE WHEN NOT vs_history AND rk > 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_dup_within,
      CAST(SUM(CASE WHEN NOT vs_history AND rk = 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_kept,
      CAST(MIN(CASE WHEN NOT vs_history AND rk = 1 THEN doc_id END)
        AS BIGINT) AS min_kept_doc
    FROM inc
    GROUP BY source
    ORDER BY source
    """,
)
def q169_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup the increment half of the corpus against the history half:
    per source, how many incoming docs are exact duplicates of history,
    duplicates within the increment, and survivors.

    Plan shape: history is scanned once for its distinct digest set;
    the increment classifies every row in one pass — a left join to the
    history digests plus a keep-min-id window, both keyed on the digest,
    then one aggregation.  Only digests shuffle."""
    from pyspark.sql.window import Window

    # NULL text is not dedupable content — excluded EXPLICITLY in both
    # engines (nulls fuzz variant: a null digest in the history set
    # poisons the oracle's IN-set for every row, while the engine's
    # anti-join silently keeps null keys — neither is a semantics)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    bucket = md5_long60(F.col("doc_id").cast("string")) % 100
    tagged = docs.select(
        "source",
        "doc_id",
        content_digest(F.col("text")).alias("digest"),
        (bucket < HISTORY_BUCKET_PCT).alias("is_history"),
    )
    hist = (
        tagged.filter("is_history").select("digest").distinct()
        .withColumn("_in_hist", F.lit(True))
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    inc = (
        tagged.filter(~F.col("is_history"))
        .join(hist, "digest", "left")
        .withColumn("vs_history", F.coalesce("_in_hist", F.lit(False)))
        .withColumn("rk", F.row_number().over(w))
    )
    kept = ~F.col("vs_history") & (F.col("rk") == 1)
    return (
        inc.groupBy("source")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(F.col("vs_history").cast("long")).alias("n_dup_vs_history"),
            F.sum((~F.col("vs_history") & (F.col("rk") > 1)).cast("long")).alias(
                "n_dup_within"
            ),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.min(F.when(kept, F.col("doc_id"))).alias("min_kept_doc"),
        )
        .orderBy("source")
    )


# ------------------------- scalable global ordinals (q185)


def global_row_ids(
    df: DataFrame, order_col: str = "doc_id", num_partitions: int | None = None
) -> DataFrame:
    """Contiguous 1-based global row ids in ``order_col`` order WITHOUT
    the single-task global sort — the scalable form of
    ``ROW_NUMBER() OVER (ORDER BY order_col)`` (which Spark plans as ONE
    window partition = one task = a cluster-wide serialization point at
    100 TB; cf. tests/test_plans.py::test_peak_concurrency_has_no_global_window).

    Two-phase zipWithIndex, DataFrame-native:

    1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` —
       range exchange, every partition sorted independently, partition
       index increases with the key.
    2. ``monotonically_increasing_id()`` then decomposes per row into
       (partition index, local offset) — NO further exchange.  One
       cheap count-per-partition job collects a BOUNDED driver artifact
       (one long per partition) whose cumulative sums become a literal
       broadcast map; row_id = offset[pid] + local + 1.

    The input is persisted across the two jobs so both see the identical
    physical partitioning.  ``order_col`` must be UNIQUE (ties would get
    an arbitrary but deterministic-within-run order; the SQL twin's
    ROW_NUMBER has the same caveat)."""
    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    n_parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    part = tracked_persist(
        df.repartitionByRange(n_parts, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    )
    mid = F.monotonically_increasing_id()
    pid = F.shiftrightunsigned(F.col("_mid"), 33)
    local = F.col("_mid").bitwiseAND((1 << 33) - 1)
    with_mid = part.withColumn("_mid", mid)
    counts = (
        with_mid.groupBy(pid.alias("_pid")).count().collect()
    )  # bounded: one row per partition
    offsets: dict[int, int] = {}
    total = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = total
        total += row["count"]
    if offsets:
        omap = F.create_map(
            *[F.lit(v) for pid_off in offsets.items() for v in pid_off]
        )
        rid = (omap[pid] + local + 1).cast("long")
    else:
        # zero-row input: F.create_map() with no args is VOID-typed and
        # fails analysis — the ids are never evaluated, only typechecked
        rid = F.lit(None).cast("long")
    return with_mid.withColumn("row_id", rid).drop("_mid")


@register(
    "q185_global_row_ids",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS row_id,
           doc_id, source
    FROM documents
    ORDER BY doc_id
    """,
)
def q185_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous ordinals over documents (see global_row_ids) —
    the resumable-data-loader offset column: (row_id, doc_id, source)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return global_row_ids(docs).select("row_id", "doc_id", "source").orderBy(
        "doc_id"
    )


# ------------------- scalable PER-GROUP ordinals (q175/q197 rebase)

#: Session conf for the size-adaptive dispatch of the grouped-window
#: machinery.  Inputs whose Catalyst plan-size estimate is at or below
#: this many bytes take the plain single-exchange window (a per-group
#: window task over ≤ this much data is harmless, and the range-exchange
#: + offset-collect machinery costs ~3× at fixture scale — the round-9
#: q100 bench-gate lesson); larger inputs take the scalable range-
#: exchange path.  Set to "0" to force the scalable path (the machinery
#: equality tests do).
SMALL_PLAN_BYTES_CONF = "spark.graft.groupedWindow.smallPlanBytes"
SMALL_PLAN_BYTES_DEFAULT = 32 * 1024 * 1024


def _fits_small_window(df: DataFrame) -> bool:
    """True when ``df``'s optimizer size estimate is within the plain-
    window budget.  Uses Catalyst's ``sizeInBytes`` (propagated from
    file sizes — no job is run); unknown/huge estimates fall through to
    the scalable path, the conservative direction."""
    try:
        limit = int(
            df.sparkSession.conf.get(
                SMALL_PLAN_BYTES_CONF, str(SMALL_PLAN_BYTES_DEFAULT)
            )
        )
        if limit <= 0:
            return False
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return est <= limit
    except Exception:  # estimate unavailable -> assume huge
        return False


def grouped_row_ids(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
    ordinal_col: str = "grp_rank",
    total_col: str = "grp_n",
) -> DataFrame:
    """Contiguous 1-based ordinals WITHIN each group, in ``order_cols``
    order, WITHOUT a single-task-per-group sort — the scalable form of
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)`` when groups
    are few and huge (languages, sources): Spark's window plans ONE
    post-shuffle partition per group, so a dominant language at 100 TB
    becomes a single-task multi-terabyte sort.  Here the exchange is
    ``repartitionByRange(group, *order_cols)`` — a skewed group SPANS
    MANY partitions (range boundaries are sampled from the combined
    key), each sorted independently.

    Same two-phase zipWithIndex as :func:`global_row_ids`:

    1. range exchange on (group, order…) + ``sortWithinPartitions`` —
       rows of a group are contiguous across consecutive partitions and
       sorted within each.
    2. ``monotonically_increasing_id`` decomposes into (pid, local);
       ONE bounded count job collects per-(pid, group) ``(count,
       min_local)`` — at most ``n_parts + n_groups − 1`` rows, because
       each group occupies a contiguous partition range.  The driver
       folds them into a literal broadcast map
       ``pid:group → group-prefix-count − min_local`` so
       ``rank = map[key] + local + 1`` with NO further exchange, plus a
       ``group → n`` map (``total_col``) for quantile denominators.

    Requires (group, order…) to be a total order (pass a unique id as
    the last order col) and a STRING group key: the broadcast offset
    map is keyed by Spark's string rendering of the group, and for
    non-string types Python's repr can differ from Spark's cast (True
    vs 'true', float/timestamp formatting), which would silently yield
    NULL ranks — so a non-string group column raises instead.  NULL
    group keys are supported via the reserved :data:`NULL_GROUP_KEY`
    sentinel (they form their own ranked group, like a window's
    PARTITION BY does).
    Adds ``ordinal_col`` (1-based rank within group) and ``total_col``
    (group size).

    Size-adaptive: inputs whose plan-size estimate fits
    :data:`SMALL_PLAN_BYTES_CONF` take the plain single-exchange window
    (identical results; a per-group task over ≤ 32 MB is harmless and
    the machinery's extra exchange + collect job costs ~3× at fixture
    scale)."""
    from pyspark.sql.types import StringType
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    gtype = df.schema[group_col].dataType
    if not isinstance(gtype, StringType):
        raise TypeError(
            f"grouped_row_ids requires a string group column; {group_col!r} "
            f"is {gtype.simpleString()} — cast it to string first (the "
            "broadcast offset map is keyed by Spark's string rendering, "
            "which differs from Python's for bool/float/timestamp)"
        )

    if _fits_small_window(df):
        ocols_s = [F.col(c) if isinstance(c, str) else c for c in order_cols]
        w_rank = Window.partitionBy(group_col).orderBy(*ocols_s)
        w_all = Window.partitionBy(group_col)
        return df.withColumn(
            ordinal_col, F.row_number().over(w_rank).cast("long")
        ).withColumn(total_col, F.count("*").over(w_all).cast("long"))

    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    keys = [F.col(group_col), *ocols]
    part = tracked_persist(
        df.repartitionByRange(n_parts, *keys).sortWithinPartitions(
            F.col(group_col), *ocols
        )
    )
    pid = F.shiftrightunsigned(F.col("_mid"), 33)
    local = F.col("_mid").bitwiseAND((1 << 33) - 1)
    with_mid = part.withColumn("_mid", F.monotonically_increasing_id())
    # NULL group keys take a sentinel on BOTH the collect and lookup
    # sides: Python renders None as 'None' while concat_ws SKIPS nulls,
    # so without it a null group's ranks silently come back NULL (nulls
    # fuzz variant).  The sentinel string is reserved (documented).
    gexpr = F.coalesce(F.col(group_col), F.lit(NULL_GROUP_KEY))
    stats = (
        with_mid.groupBy(pid.alias("_pid"), gexpr.alias("_grp"))
        .agg(F.count("*").alias("_cnt"), F.min(local).alias("_lo"))
        .collect()
    )  # bounded: contiguous group ranges -> <= n_parts + n_groups - 1 rows
    totals: dict = {}
    adjust: dict[str, int] = {}
    for row in sorted(stats, key=lambda r: (str(r["_grp"]), r["_pid"])):
        g = row["_grp"]
        adjust[f"{row['_pid']}:{g}"] = totals.get(g, 0) - row["_lo"]
        totals[g] = totals.get(g, 0) + row["_cnt"]
    # zero-row input: argless create_map is VOID-typed and fails
    # analysis; a typed null map typechecks and is never evaluated
    amap = (
        F.create_map(*[F.lit(v) for kv in adjust.items() for v in kv])
        if adjust
        else F.lit(None).cast("map<string,bigint>")
    )
    tmap = (
        F.create_map(
            *[
                F.lit(v)
                for g_n in totals.items()
                for v in (str(g_n[0]), g_n[1])
            ]
        )
        if totals
        else F.lit(None).cast("map<string,bigint>")
    )
    key = F.concat_ws(":", pid.cast("string"), gexpr)
    return (
        with_mid.withColumn(
            ordinal_col, (amap[key] + local + 1).cast("long")
        )
        .withColumn(total_col, tmap[gexpr].cast("long"))
        .drop("_mid")
    )


def grouped_percent_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "pr",
    num_partitions: int | None = None,
) -> DataFrame:
    """``PERCENT_RANK() OVER (PARTITION BY group ORDER BY ...)`` on the
    scalable :func:`grouped_row_ids` machinery.  With a total order
    (unique tie-break in ``order_cols``) rank == row_number, so
    pr = (rank−1)/(n−1) — an integer-derived IEEE division, bitwise
    equal to the window form on both engines; n == 1 → 0.0 (the
    engines' 0/0 convention)."""
    ranked = grouped_row_ids(
        df, group_col, order_cols, num_partitions=num_partitions
    )
    n1 = F.col("grp_n") - F.lit(1)
    pr = F.when(n1 == 0, F.lit(0.0)).otherwise(
        (F.col("grp_rank") - F.lit(1)).cast("double") / n1
    )
    return ranked.withColumn(out_col, pr)


def grouped_ntile(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n_tiles: int,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (PARTITION BY group ORDER BY ...)`` on
    :func:`grouped_row_ids` — pure closed-form arithmetic on (rank, n):
    the first ``n % k`` tiles hold ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋``
    (both engines' NTILE definition).  Divisions are of exactly-
    divisible integers (`x − x % k`), so exact for n < 2^53 — no float
    rounding hazard."""
    ranked = grouped_row_ids(
        df, group_col, order_cols, num_partitions=num_partitions
    )
    n, r, k = F.col("grp_n"), F.col("grp_rank"), F.lit(n_tiles)

    def _exact_div(a, b):  # floor(a/b): a - a%b is exactly divisible
        return ((a - a % b) / b).cast("long")

    q = _exact_div(n, k)  # floor(n / k)
    rem = n % k
    big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles

    def _ceil_div(a, b):
        return _exact_div(a + b - 1, b)

    tile = F.when(r <= big, _ceil_div(r, q + 1)).otherwise(
        rem + _ceil_div(r - big, q)
    )
    return ranked.withColumn(out_col, tile.cast("int"))


def grouped_lags(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    n_lags: int,
    out_prefix: str = "lag_",
    num_partitions: int | None = None,
) -> DataFrame:
    """``LAG(value, j) OVER (PARTITION BY group ORDER BY …)`` for
    j = 1..k without a per-group single-task sort — closes the last
    few-group window hazard class (sequential lag taps, e.g. the q102
    EWMA smoother over five event_type series).

    A lag is not rank arithmetic, so :func:`grouped_row_ids` alone can't
    produce it — but it reduces lags to an EQUIJOIN: with contiguous
    per-group ordinals ``r``, ``lag_j(row r) = value(row r − j)``.  Each
    row therefore publishes its value to ordinals r+1..r+k (one explode,
    k small), the copies are folded to one row per (group, ordinal) by a
    conditional aggregate, and a left join on (group, ordinal) — a
    high-cardinality composite key, never a per-group hotspot — attaches
    all k lags at once.  First-j rows of a group get NULL lag_j, exactly
    the window semantics.

    Cost: ~k× the input flows through one extra aggregate + join — linear
    and fully parallel, the scale trade for removing the single-task
    sort.  Requires the :func:`grouped_row_ids` contracts (string group,
    total order) and an integral/atomic ``value_col``."""
    ranked = grouped_row_ids(
        df,
        group_col,
        order_cols,
        num_partitions=num_partitions,
        ordinal_col="_lr",
        total_col="_ln",
    )
    lag_js = list(range(1, n_lags + 1))
    shifted = ranked.select(
        F.col(group_col),
        F.col("_lr"),
        F.col(value_col),
    ).select(
        group_col,
        F.explode(F.array(*[F.lit(j) for j in lag_js])).alias("_j"),
        "_lr",
        value_col,
    ).select(
        group_col,
        (F.col("_lr") + F.col("_j")).alias("_lr"),
        "_j",
        F.col(value_col),
    )
    lagtab = shifted.groupBy(group_col, "_lr").agg(
        *[
            F.max(F.when(F.col("_j") == j, F.col(value_col))).alias(
                f"{out_prefix}{j}"
            )
            for j in lag_js
        ]
    )
    return ranked.join(lagtab, [group_col, "_lr"], "left").drop("_lr", "_ln")


def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "run_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``SUM(value) OVER (PARTITION BY group ORDER BY … ROWS UNBOUNDED
    PRECEDING)`` without a single-task-per-group sort — the prefix-sum
    sibling of :func:`grouped_row_ids`, for the token-packing /
    curriculum operators whose group key is few-and-huge (source, split).

    Plan shape:

    1. range exchange on (group, order…) — a dominant group spans many
       partitions — plus ``sortWithinPartitions``;
    2. ONE bounded job collects per-(partition, group) ``SUM(value)``
       (≤ n_parts + n_groups − 1 rows, contiguous group ranges); the
       driver folds them into a broadcast ``pid:group → sum of all
       PRIOR partitions' value`` offset map;
    3. a window partitioned by ``(pid, group)`` computes the running sum
       WITHIN each original partition — its partition key is
       high-cardinality (one per range partition), so every window task
       is bounded by the range-partition size, never by group size;
    4. ``run_sum = offset[pid:group] + within-partition running sum``.

    Exactness: ``value_col`` must be integral (token counts, cents) —
    sums stay in BIGINT, so the result is bitwise equal to the
    single-exchange window form.  Same contracts as
    :func:`grouped_row_ids`: STRING group key (raises otherwise; NULL
    keys supported via :data:`NULL_GROUP_KEY`), (group, order…) a
    total order.  ``order_cols`` may mix
    names and sort expressions (``F.desc("score")``).

    Size-adaptive like :func:`grouped_row_ids`: plan estimates within
    :data:`SMALL_PLAN_BYTES_CONF` take the plain single-exchange window
    — bitwise-equal by integral-sum exactness, and ~3× cheaper at
    fixture scale (the round-9 q100 bench-gate regression)."""
    from pyspark.sql.types import StringType
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    gtype = df.schema[group_col].dataType
    if not isinstance(gtype, StringType):
        raise TypeError(
            f"grouped_running_sum requires a string group column; "
            f"{group_col!r} is {gtype.simpleString()} — cast it first"
        )
    if _fits_small_window(df):
        ocols_s = [F.col(c) if isinstance(c, str) else c for c in order_cols]
        w = (
            Window.partitionBy(group_col)
            .orderBy(*ocols_s)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = F.sum(F.col(value_col).cast("long")).over(w)
        return df.withColumn(out_col, run.cast("long"))
    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    keys = [F.col(group_col), *ocols]
    # No sortWithinPartitions here (unlike grouped_row_ids): the
    # per-(pid, group) partial sums are order-independent and the local
    # window sorts its own partitions — the range exchange alone gives
    # the contiguity the offset map needs.
    part = tracked_persist(df.repartitionByRange(n_parts, *keys))
    pid = F.spark_partition_id()
    with_pid = part.withColumn("_pid", pid)
    # NULL group keys: same sentinel rule as grouped_row_ids
    gexpr = F.coalesce(F.col(group_col), F.lit(NULL_GROUP_KEY))
    stats = (
        with_pid.groupBy("_pid", gexpr.alias("_grp"))
        .agg(F.sum(F.col(value_col).cast("long")).alias("_sum"))
        .collect()
    )  # bounded: contiguous group ranges -> <= n_parts + n_groups - 1 rows
    offsets: dict[str, int] = {}
    prior: dict = {}
    for row in sorted(stats, key=lambda r: (str(r["_grp"]), r["_pid"])):
        g = row["_grp"]
        offsets[f"{row['_pid']}:{g}"] = prior.get(g, 0)
        prior[g] = prior.get(g, 0) + (row["_sum"] or 0)
    omap = (
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
        if offsets
        else F.lit(None).cast("map<string,bigint>")
    )  # zero-row input: argless create_map is VOID-typed (fails analysis)
    key = F.concat_ws(":", F.col("_pid").cast("string"), gexpr)
    w_local = Window.partitionBy("_pid", group_col).orderBy(
        *ocols
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local_run = F.sum(F.col(value_col).cast("long")).over(w_local)
    return (
        with_pid.withColumn(out_col, (omap[key] + local_run).cast("long"))
        .drop("_pid")
    )


# --------------------- deterministic epoch shuffle manifest (q194)

#: Epochs and shards for the registered manifest query.
EPOCH_COUNT = 2
EPOCH_SHARDS = 8


def epoch_shuffle_manifest(
    docs: DataFrame,
    n_epochs: int = EPOCH_COUNT,
    n_shards: int = EPOCH_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible per-epoch training order WITHOUT a seeded RNG or a
    global sort: each (epoch, doc) gets a portable md5 shuffle key;
    shard = key mod n_shards; position = rank within (epoch, shard) by
    (key, id).  Every epoch is a different pseudorandom permutation,
    identical on any engine/partitioning/rerun — the property resumable
    multi-epoch training needs.  The window partitions on
    (epoch, shard), so ordering work splits into epochs × shards
    independent sorts (thousands of shards at 100 TB, never one task);
    cross-shard order is by shard id, the same contract as the q168
    manifest."""
    epoch = F.explode(
        F.array(*[F.lit(e) for e in range(n_epochs)])
    ).alias("epoch")
    keyed = docs.select(F.col(id_col), epoch).select(
        "epoch",
        F.col(id_col),
        md5_long60(
            F.concat_ws(":", F.col("epoch").cast("string"),
                        F.col(id_col).cast("string"))
        ).alias("shuffle_key"),
    )
    keyed = keyed.withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("long")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", id_col)
    return (
        keyed.withColumn("position", F.row_number().over(w).cast("long"))
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "shard",
            "position",
            id_col,
            "shuffle_key",
        )
        .orderBy("epoch", "shard", "position")
    )


_EPOCH_KEY_SQL = MD5_LONG60_SQL.format(
    x="CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
)


@register(
    "q194_epoch_shuffle_manifest",
    oracle=f"""
    WITH keyed AS (
      SELECT epoch, doc_id, {_EPOCH_KEY_SQL} AS shuffle_key
      FROM documents
      CROSS JOIN (SELECT unnest(range({EPOCH_COUNT})) AS epoch)
    ),
    sharded AS (
      SELECT epoch, doc_id, shuffle_key,
             shuffle_key % {EPOCH_SHARDS} AS shard
      FROM keyed
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY epoch, shard ORDER BY shuffle_key, doc_id
           ) AS BIGINT) AS position,
           doc_id,
           shuffle_key
    FROM sharded
    ORDER BY epoch, shard, position
    """,
)
def q194_epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch sharded shuffle manifest over documents (see
    epoch_shuffle_manifest): (epoch, shard, position, doc_id,
    shuffle_key), fully deterministic on any engine."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle_manifest(docs)
