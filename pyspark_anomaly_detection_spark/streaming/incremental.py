"""Incremental gold maintenance via ``foreachBatch``: the streaming form
of the reference's gold daily aggregation (reference src/data/gold.py:31-41),
kept up to date as events arrive instead of recomputed nightly.

Pattern: micro-batch → re-aggregate ONLY the days touched by the batch
(reading back just those partitions of the existing gold table via
partition pruning) → ``overwrite_partitions`` rewrites exactly those
day-partitions.  At 100 TB/day the write amplification is bounded by the
watermark horizon (late data only reopens recent days), not by table
history.

``foreachBatch`` is the right tool because the sink is a plain parquet
layout (no streaming sink supports dynamic partition overwrite); each
batch function runs as a normal batch job with full DataFrame semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.writers import overwrite_partitions


def daily_gold(events: DataFrame) -> DataFrame:
    """The gold aggregate: per (day, event_type) counts and exact sums —
    re-aggregatable partials (cf. events/rollup.py)."""
    return events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
    )


def start_incremental_gold(
    stream: DataFrame,
    gold_path: str,
    raw_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the daily gold table incrementally.

    Each micro-batch: find touched days, re-aggregate those days from the
    raw store (idempotent — replays converge to the batch answer), rewrite
    only those partitions.  Aggregating from raw per touched day (rather
    than merging partials) keeps the batch function idempotent under
    at-least-once delivery.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        days = [r.day for r in batch_df.select(F.to_date("ts").alias("day")).distinct().collect()]
        raw = spark.read.parquet(raw_path)
        touched = raw.filter(F.to_date("ts").isin(days))
        overwrite_partitions(daily_gold(touched), gold_path, ["day"])

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_cms(
    stream: DataFrame,
    sketch_path: str,
    checkpoint: str,
    text_col: str = "text",
    available_now: bool = True,
):
    """Maintain a Count-Min sketch of a document stream incrementally.

    CMS counters are additive, so streaming maintenance is sketch algebra:
    each micro-batch writes ITS OWN sketch delta into a ``batch_id``
    partition (overwrite — replays of a batch rewrite the same partition,
    so at-least-once delivery cannot double-count), and the current sketch
    is the elementwise sum over deltas (``read_cms``).  State size is
    bounded by D×W counters per batch regardless of stream volume — the
    pattern for heavy-hitter tracking over unbounded streams at 100 TB.
    """
    from pyspark_anomaly_detection_spark.functions import tokens
    from pyspark_anomaly_detection_spark.text.stats import cms_sketch

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tok = batch_df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        delta = cms_sketch(tok).withColumn("batch_id", F.lit(int(batch_id)))
        overwrite_partitions(delta, sketch_path, ["batch_id"])

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Current sketch = elementwise sum of every batch delta."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def start_incremental_drift(
    stream: DataFrame,
    bins_path: str,
    checkpoint: str,
    value_col: str = "value",
    available_now: bool = True,
):
    """Maintain the PSI drift histogram (quality/drift.py's fixed bins)
    over a value stream incrementally.

    Bin counts are additive, so the CMS delta pattern applies unchanged:
    each micro-batch writes its own per-bin counts into a ``batch_id``
    partition (overwrite — replays rewrite the same partition, so
    at-least-once delivery cannot double-count); the live histogram is
    the per-bin sum over deltas.  PSI between any two stored windows is
    then driver-side arithmetic over ≤ n_bins rows
    (``quality.drift.psi_from_components``) — the always-on drift gate
    for a 100 TB feature stream with bounded state.
    """
    from pyspark_anomaly_detection_spark.quality.drift import _bin_expr

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = (
            batch_df.select(_bin_expr(value_col).alias("bin_id"))
            .groupBy("bin_id")
            .agg(F.count("*").alias("n"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        overwrite_partitions(delta, bins_path, ["batch_id"])

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_value_histogram(spark: SparkSession, bins_path: str) -> DataFrame:
    """Live histogram = per-bin sum over every batch delta."""
    return (
        spark.read.parquet(bins_path)
        .groupBy("bin_id")
        .agg(F.sum("n").alias("n"))
    )


def dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of incremental exact dedup (the streaming form of
    the batch operator ``text.shards.q169_incremental_dedup``).

    Within-batch keep-min-id, then anti-join against the accumulated
    digest store EXCLUDING this batch's own partition — so a replayed
    batch does not see its own digests and rewrites its two partitions
    to the identical result (idempotent under at-least-once delivery).
    Shuffles carry 32-byte digests, never text; the store is batch_id-
    partitioned parquet, compacted/bucketed at cluster scale."""
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.text.dedup import content_digest

    spark = batch_df.sparkSession
    w = Window.partitionBy("_digest").orderBy(id_col)
    batch_min = (
        batch_df.withColumn("_digest", content_digest(F.col(text_col)))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    from pyspark.errors import AnalysisException

    try:
        seen = (
            spark.read.parquet(store_path)
            .filter(F.col("batch_id") != int(batch_id))
            .select("digest")
            .distinct()
        )
    except AnalysisException:  # first batch: no store yet
        seen = None
    kept = batch_min
    if seen is not None:
        kept = batch_min.join(
            seen, batch_min["_digest"] == seen["digest"], "left_anti"
        )
    kept = kept.withColumn("batch_id", F.lit(int(batch_id))).persist()
    overwrite_partitions(kept.drop("_digest"), out_path, ["batch_id"])
    overwrite_partitions(
        kept.select(F.col("_digest").alias("digest"), "batch_id"),
        store_path,
        ["batch_id"],
    )
    kept.unpersist()


def start_incremental_dedup(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Exact-dedup a document stream against everything already ingested:
    each micro-batch keeps only content never seen in prior batches, and
    appends its new digests to the store.  State is the digest store
    itself (32 bytes/unique doc — the minimum any exact dedup can hold),
    not executor memory, so the operator survives restarts and scales to
    corpus-lifetime history."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dedup_batch(batch_df, batch_id, store_path, out_path, text_col, id_col)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_upsert(
    stream: DataFrame,
    table_path: str,
    partition_by: list[str],
    key_col: str,
    checkpoint: str,
    order_col: str = "ts",
    available_now: bool = True,
):
    """CDC-apply: maintain a keyed Parquet table from a change stream via
    ``foreachBatch`` + :func:`io.maintenance.merge_keys` — the streaming
    form of Delta's ``MERGE INTO`` semantics, without the Delta runtime
    (the reference's silver layer, src/data/silver.py, only
    overwrite-writes; this is the incremental form a real deployment of
    that storage layer would use).

    Each micro-batch collapses to latest-change-per-key (max ``order_col``,
    deterministic) and is then applied CONDITIONALLY — ``WHEN MATCHED AND
    source.order_col >= target.order_col THEN UPDATE`` — so out-of-order
    batches (a later file carrying older events) cannot regress a key:
    the table always converges to the global latest-per-key regardless of
    file arrival order.  Idempotent under at-least-once delivery:
    replaying a batch re-applies the same values onto the already-updated
    rows.  Write amplification is bounded by the touched-partitions set
    per batch, not table size (merge_keys' partition-pruned rewrite)."""
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.io.maintenance import merge_keys

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        tiebreak = [
            F.desc(c)
            for c in batch_df.columns
            if c not in (key_col, order_col)
        ]
        w = Window.partitionBy(key_col).orderBy(F.desc(order_col), *tiebreak)
        latest = (
            batch_df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        try:
            existing = spark.read.parquet(table_path)
        except Exception:  # first batch: table does not exist yet
            latest.write.partitionBy(*partition_by).parquet(table_path)
            return
        # anti-regression gate: drop updates older than the stored row.
        # Scale shape: semi-filter the table by the BATCH's keys first
        # (batch keys broadcast), so the per-key order lookup is bounded
        # by batch size, never table size — then that small frame
        # broadcasts back onto the batch.
        batch_keys = F.broadcast(latest.select(key_col).distinct())
        cur = F.broadcast(
            existing.join(batch_keys, key_col, "left_semi").select(
                F.col(key_col), F.col(order_col).alias("_cur_ord")
            )
        )
        gated = (
            latest.join(cur, key_col, "left_outer")
            .filter(
                F.col("_cur_ord").isNull()
                | (F.col(order_col) >= F.col("_cur_ord"))
            )
            .drop("_cur_ord")
        )
        if gated.isEmpty():
            return
        merge_keys(spark, table_path, partition_by, key_col, gated)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def span_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    out_path: str,
    window_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of incremental KEEP-ONE substring dedup — the
    streaming form of ``text.dedup.keep_one_dup_spans`` (q195).

    Cross-batch: any window hash already in the store makes EVERY
    occurrence in this batch non-owner (the global first occurrence
    lives in an earlier batch).  Within-batch: the same (doc_id, pos)
    row_number election as the batch operator.  Because keep-one never
    strips the first occurrence, no batch ever needs retroactive
    rewriting — when batches arrive in ascending id order the
    accumulated output EQUALS the batch operator on the full corpus
    (asserted in tests/test_incremental_gold.py).

    State is the distinct-window-hash store (8 bytes/unique window —
    the minimum any exact substring dedup can hold), batch_id-
    partitioned parquet; reads exclude this batch's own partition, so a
    replayed batch rewrites both partitions identically (idempotent
    under at-least-once delivery).  Shuffles carry (hash, doc, pos)
    longs, never text."""
    from pyspark.errors import AnalysisException
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.text.dedup import (
        DUP_WINDOW_TOKENS,
        _merge_marked_intervals,
        _rolling_window_hashes,
        _strip_by_spans,
    )

    k = window_tokens or DUP_WINDOW_TOKENS
    spark = batch_df.sparkSession
    wins = _rolling_window_hashes(batch_df, k, text_col, id_col).persist()
    try:
        try:
            seen = (
                spark.read.parquet(store_path)
                .filter(F.col("batch_id") != int(batch_id))
                .select("wh")
                .distinct()
            )
        except AnalysisException:  # first batch: no store yet
            seen = None
        w = Window.partitionBy("wh").orderBy(id_col, "pos")
        ranked = wins.withColumn("_rk", F.row_number().over(w))
        non_owner = ranked.filter(F.col("_rk") >= 2).select(
            id_col, "n_tokens", "pos"
        )
        if seen is not None:
            cross = ranked.join(seen, "wh").select(id_col, "n_tokens", "pos")
            non_owner = non_owner.unionByName(cross).distinct()
        dup = non_owner.select(
            id_col, "n_tokens", "pos", (F.col("pos") + k - 1).alias("end_pos")
        )
        cleaned = _strip_by_spans(
            batch_df, _merge_marked_intervals(dup, id_col), text_col, id_col
        ).withColumn("batch_id", F.lit(int(batch_id)))
        overwrite_partitions(cleaned, out_path, ["batch_id"])

        new_hashes = wins.select("wh").distinct()
        if seen is not None:
            new_hashes = new_hashes.join(seen, "wh", "left_anti")
        overwrite_partitions(
            new_hashes.withColumn("batch_id", F.lit(int(batch_id))),
            store_path,
            ["batch_id"],
        )
    finally:
        # unpersist even when a write fails mid-batch: foreachBatch retries
        # must not accumulate leaked cached datasets in executor memory
        wins.unpersist()


def start_incremental_span_dedup(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    window_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Keep-one substring dedup over a document stream: each micro-batch
    strips every token range whose window was already seen (in the store
    or earlier in the batch by the (doc_id, pos) election) and appends
    its new window hashes to the store."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        span_dedup_batch(
            batch_df, batch_id, store_path, out_path,
            window_tokens, text_col, id_col,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def minhash_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of incremental NEAR-dup dedup — the streaming form
    of ``text.dedup.lsh_keep_first`` (q204).

    Cross-batch: any MinHash band bucket already in the store makes every
    doc touching it a near-dup of an earlier batch (the store's buckets
    are injected as earlier-than-any-id sentinels).  Within-batch: the
    same order-independent min-id-per-bucket verdict as the batch
    operator.  Because the rule judges a doc against ALL earlier docs
    (kept or dropped), the store must hold the buckets of EVERY seen doc
    — and then, when batches arrive in ascending id order, the
    accumulated kept set EQUALS the batch operator on the full corpus
    (asserted in tests/test_incremental_gold.py).

    State is the distinct (band, band_sig) bucket store (a band id plus
    two 31-bit hashes per occupied bucket), batch_id-partitioned parquet;
    reads exclude this batch's own partition, so a replayed batch
    rewrites both partitions identically (idempotent under at-least-once
    delivery).  Shuffles carry signatures and verdicts, never text."""
    from pyspark.errors import AnalysisException

    from pyspark_anomaly_detection_spark.text.dedup import (
        banded_buckets,
        lsh_keep_first,
    )

    spark = batch_df.sparkSession
    try:
        occupied = (
            spark.read.parquet(store_path)
            .filter(F.col("batch_id") != int(batch_id))
            .select("band", "band_sig")
            .distinct()
        )
    except AnalysisException:  # first batch: no store yet
        occupied = None
    verdicts = lsh_keep_first(batch_df, occupied, text_col=text_col, id_col=id_col)
    kept = (
        batch_df.join(
            verdicts.filter(F.col("kept")).select(id_col), id_col
        )
        .withColumn("batch_id", F.lit(int(batch_id)))
    )
    overwrite_partitions(kept, out_path, ["batch_id"])

    new_buckets = banded_buckets(
        batch_df, text_col=text_col, id_col=id_col
    ).select("band", "band_sig").distinct()
    if occupied is not None:
        new_buckets = new_buckets.join(
            occupied, ["band", "band_sig"], "left_anti"
        )
    overwrite_partitions(
        new_buckets.withColumn("batch_id", F.lit(int(batch_id))),
        store_path,
        ["batch_id"],
    )


def start_incremental_minhash_dedup(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Near-dup dedup over a document stream: each micro-batch keeps only
    docs whose MinHash band buckets were never occupied (in the store or
    by a smaller-id doc within the batch) and appends every bucket the
    batch touched to the store — continuous-ingest LSH dedup with state
    on disk, not in executor memory."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        minhash_dedup_batch(
            batch_df, batch_id, store_path, out_path, text_col, id_col
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: Sentinel partition holding folded (compacted) bucket-store batches.
#: Never a real micro-batch id (Spark batch ids start at 0), so replay's
#: ``batch_id != current`` store read always includes it.
COMPACTED_BATCH_ID = -1


def compact_minhash_store(
    spark: SparkSession,
    store_path: str,
    keep_latest: int = 1,
    target_file_bytes: int | None = None,
) -> dict[str, int]:
    """Fold committed batch partitions of the incremental minhash bucket
    store into one compacted sentinel partition (``batch_id=-1``).

    ``start_incremental_minhash_dedup`` appends one ``batch_id=N``
    partition (>=1 file) per micro-batch, so file count grows linearly
    with stream lifetime while each file holds only one batch's new
    buckets — the small-file problem ``compact_parquet`` exists to fix,
    but the store cannot use it directly: a flat rewrite would break the
    partition layout that replay idempotence depends on.  This fold
    preserves it:

    * only batches OLDER than the newest ``keep_latest`` are folded —
      under at-least-once delivery the only partition a restart can
      rewrite is the last uncommitted batch, which stays unfolded, so a
      replay never finds its own buckets pre-folded (which would mark
      the whole batch as dups and empty its output partition);
    * the store's contract is set-union semantics (readers ``distinct()``
      the buckets), so the fold — a ``distinct()`` over the folded
      batches plus any prior sentinel partition — changes no read
      result, and a crash between staging swap and source-dir cleanup
      leaves only harmless duplicates that the next fold removes.

    Same single-writer caveat as ``compact_parquet``: the sentinel
    partition briefly vacates between the two renames.  Returns
    ``{"folded_batches", "files_written", "buckets"}`` (zeros when there
    is nothing to fold)."""
    from pyspark_anomaly_detection_spark.io.maintenance import (
        TARGET_FILE_BYTES,
        _clear_leftover,
        _rename_or_raise,
        plan_file_count,
    )

    target = target_file_bytes or TARGET_FILE_BYTES
    jvm = spark.sparkContext._jvm
    fs_path = jvm.org.apache.hadoop.fs.Path
    base = fs_path(store_path)
    fs = base.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(base):
        return {"folded_batches": 0, "files_written": 0, "buckets": 0}

    ids = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    real = sorted(b for b in ids if b != COMPACTED_BATCH_ID)
    fold = real[: -keep_latest] if keep_latest else real
    sources = fold + ([COMPACTED_BATCH_ID] if COMPACTED_BATCH_ID in ids else [])
    if len(sources) < 2:
        return {"folded_batches": 0, "files_written": 0, "buckets": 0}

    def part_dir(bid: int) -> str:
        return f"{store_path.rstrip('/')}/batch_id={bid}"

    total_bytes = sum(
        fs.getContentSummary(fs_path(part_dir(b))).getLength() for b in sources
    )
    n_files = plan_file_count(total_bytes, target)

    folded = (
        spark.read.parquet(store_path)
        .filter(F.col("batch_id").isin([int(b) for b in sources]))
        .select("band", "band_sig")
        .distinct()
        .repartition(n_files)
    )
    n_buckets = folded.count()

    staging = store_path.rstrip("/") + "__bucket_compact"
    trash = store_path.rstrip("/") + "__bucket_old"
    _clear_leftover(fs, jvm, staging)
    _clear_leftover(fs, jvm, trash)
    folded.write.mode("overwrite").parquet(staging)

    sentinel = fs_path(part_dir(COMPACTED_BATCH_ID))
    if fs.exists(sentinel):
        _rename_or_raise(fs, sentinel, fs_path(trash), "bucket fold (old sentinel)")
    try:
        _rename_or_raise(
            fs, fs_path(staging), sentinel, "bucket fold (staging -> sentinel)"
        )
    except IOError:
        if fs.exists(fs_path(trash)):
            fs.rename(fs_path(trash), sentinel)
        raise
    _clear_leftover(fs, jvm, trash)
    for b in fold:
        fs.delete(fs_path(part_dir(b)), True)
    return {
        "folded_batches": len(fold),
        "files_written": n_files,
        "buckets": n_buckets,
    }
