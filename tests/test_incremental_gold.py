"""foreachBatch incremental gold: multi-batch streaming maintenance must
converge to the batch aggregate, and a late-arriving file must reopen and
correct only its day's partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.streaming.incremental import (
    daily_gold,
    start_incremental_gold,
)
from pyspark_anomaly_detection_spark.streaming.jobs import read_event_stream


def _gold_dict(df):
    return {
        (str(r.day), r.event_type): (r.n_events, float(r.value_sum))
        for r in df.collect()
    }


def test_incremental_gold_converges_to_batch(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.parquet(raw)

    stream = read_event_stream(spark, raw, max_files_per_trigger=1)
    q = start_incremental_gold(stream, gold, raw, ckpt)
    q.awaitTermination()

    got = _gold_dict(spark.read.parquet(gold))
    want = _gold_dict(daily_gold(events))
    assert got == want


def test_late_file_corrects_only_its_day(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    first_day = events.agg(F.min(F.to_date("ts"))).collect()[0][0]
    on_time = events.filter(F.to_date("ts") != F.lit(first_day))
    late = events.filter(F.to_date("ts") == F.lit(first_day))

    on_time.write.parquet(raw)
    stream = read_event_stream(spark, raw, max_files_per_trigger=2)
    start_incremental_gold(stream, gold, raw, ckpt).awaitTermination()
    assert (
        spark.read.parquet(gold)
        .filter(F.col("day") == F.lit(first_day))
        .count()
        == 0
    )

    # late data lands; the restarted availableNow stream picks up only the
    # new file (checkpoint) and repairs the first day's partition
    late.write.mode("append").parquet(raw)
    stream2 = read_event_stream(spark, raw, max_files_per_trigger=2)
    start_incremental_gold(stream2, gold, raw, ckpt).awaitTermination()

    got = _gold_dict(spark.read.parquet(gold))
    want = _gold_dict(daily_gold(events))
    assert got == want


def test_incremental_cms_converges_to_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming CMS maintenance: batch-id-partitioned delta writes are
    replay-idempotent, and the merged stream sketch equals the one-shot
    batch sketch EXACTLY (counter additivity)."""
    from pyspark_anomaly_detection_spark.streaming.incremental import (
        read_cms,
        start_incremental_cms,
    )
    from pyspark_anomaly_detection_spark.text.stats import cms_sketch

    raw = str(tmp_path / "docs")
    sketch = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4).write.parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    q = start_incremental_cms(stream, sketch, ckpt)
    q.awaitTermination()

    n_batches = spark.read.parquet(sketch).select("batch_id").distinct().count()
    assert n_batches > 1, "maxFilesPerTrigger=1 must produce multiple deltas"

    got = {
        (r.row_id, r.bucket): r.cnt for r in read_cms(spark, sketch).collect()
    }
    want = {
        (r.row_id, r.bucket): r.cnt
        for r in cms_sketch(
            docs.select(F.explode(F.split("text", " ")).alias("tok"))
        ).collect()
    }
    assert got == want


def test_incremental_dedup_keeps_each_content_once(spark, sf_dir, tmp_path):
    """Streaming exact dedup against the accumulated digest store: across
    all micro-batches every distinct content survives EXACTLY once (the
    dedup guarantee, independent of batch order), and replaying a batch
    with the same batch_id rewrites its partitions to the identical
    result (at-least-once safety)."""
    from pyspark_anomaly_detection_spark.streaming.incremental import (
        dedup_batch,
        start_incremental_dedup,
    )
    from pyspark_anomaly_detection_spark.text.dedup import content_digest

    raw = str(tmp_path / "docs")
    store = str(tmp_path / "digests")
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents")
    # the corpus has no natural exact dups — inject cross-batch copies
    # (same text, new ids) as a separate file so later batches must drop
    # them against the store
    copies = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    docs.repartition(3).write.parquet(raw)
    copies.coalesce(1).write.mode("append").parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    q = start_incremental_dedup(stream, store, out, ckpt)
    q.awaitTermination()

    n_batches = spark.read.parquet(out).select("batch_id").distinct().count()
    assert n_batches > 1, "maxFilesPerTrigger=1 must produce multiple batches"
    docs = docs.unionByName(copies)

    kept = spark.read.parquet(out)
    kept_digests = [
        r.d for r in kept.select(content_digest(F.col("text")).alias("d")).collect()
    ]
    all_digests = {
        r.d for r in docs.select(content_digest(F.col("text")).alias("d")).collect()
    }
    assert len(kept_digests) == len(set(kept_digests)), "a content survived twice"
    assert set(kept_digests) == all_digests, "a content was lost"

    # replay batch 0 (same batch_id, same rows): outputs must not change
    before = {tuple(r) for r in kept.collect()}
    batch0 = kept.filter(F.col("batch_id") == 0).drop("batch_id")
    dedup_batch(batch0, 0, store, out)
    after = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert after == before


def test_incremental_drift_histogram_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming drift maintenance: per-batch bin-count deltas merge to
    exactly the one-shot batch histogram (bin-count additivity), giving
    the always-on PSI gate bounded state."""
    from pyspark_anomaly_detection_spark.quality.drift import _bin_expr
    from pyspark_anomaly_detection_spark.streaming.incremental import (
        read_value_histogram,
        start_incremental_drift,
    )

    raw = str(tmp_path / "events")
    bins = str(tmp_path / "bins")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    q = start_incremental_drift(stream, bins, ckpt)
    q.awaitTermination()

    n_batches = spark.read.parquet(bins).select("batch_id").distinct().count()
    assert n_batches > 1, "maxFilesPerTrigger=1 must produce multiple deltas"

    got = {r.bin_id: r.n for r in read_value_histogram(spark, bins).collect()}
    want = {
        r.bin_id: r.n
        for r in events.select(_bin_expr("value").alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_incremental_dedup_restart_recovery(spark, sf_dir, tmp_path):
    """Kill-and-resume (round-3 verdict directive #6): stop the dedup
    stream after the first micro-batch commits, restart from the SAME
    checkpoint, and drain.  Exactly-once digest semantics must hold
    across the restart: every distinct content survives once, the digest
    store holds each digest once, and the restarted query continues from
    the checkpointed offset (batch ids keep increasing — committed
    batches are not reprocessed into different partitions)."""
    import time

    from pyspark_anomaly_detection_spark.streaming.incremental import (
        start_incremental_dedup,
    )
    from pyspark_anomaly_detection_spark.text.dedup import content_digest

    raw = str(tmp_path / "docs")
    store = str(tmp_path / "digests")
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    docs.repartition(4).write.parquet(raw)
    copies.coalesce(1).write.mode("append").parquet(raw)
    all_docs = docs.unionByName(copies)

    def make_stream():
        return (
            spark.readStream.schema(spark.read.parquet(raw).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )

    # phase 1: continuous trigger, stop as soon as one batch commits
    q = start_incremental_dedup(make_stream(), store, out, ckpt,
                                available_now=False)
    deadline = time.time() + 60
    committed = 0
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] is not None and p["numInputRows"] > 0:
            committed += 1
            if committed >= 1:
                break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert committed >= 1, "stream never committed a batch before the kill"
    batches_before = {
        r.batch_id for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    }
    assert batches_before, "no output partition before the restart"

    # phase 2: resume from the SAME checkpoint and drain the backlog
    q2 = start_incremental_dedup(make_stream(), store, out, ckpt,
                                 available_now=True)
    q2.awaitTermination()

    batches_after = {
        r.batch_id for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    }
    # resumed query continued the checkpointed batch numbering
    assert batches_before <= batches_after
    assert len(batches_after) > len(batches_before)

    kept_digests = [
        r.d
        for r in spark.read.parquet(out)
        .select(content_digest(F.col("text")).alias("d"))
        .collect()
    ]
    all_digests = {
        r.d
        for r in all_docs.select(content_digest(F.col("text")).alias("d")).collect()
    }
    assert len(kept_digests) == len(set(kept_digests)), (
        "restart duplicated a content"
    )
    assert set(kept_digests) == all_digests, "restart lost a content"

    # digest store: exactly one row per distinct digest across partitions
    store_digests = [r.digest for r in spark.read.parquet(store).collect()]
    assert len(store_digests) == len(set(store_digests))
    assert set(store_digests) == all_digests


def test_incremental_upsert_converges_to_latest_per_key(spark, sf_dir, tmp_path):
    """Streaming CDC-apply over the events table: after draining the
    backlog the keyed table holds exactly the latest event per user —
    the same answer a one-shot batch latest-per-key computes — and a
    second identical run (fresh checkpoint, same files) leaves the table
    unchanged (merge idempotence)."""
    from pyspark.sql.window import Window

    from pyspark_anomaly_detection_spark.streaming.incremental import (
        start_incremental_upsert,
    )

    raw = str(tmp_path / "changes")
    table = str(tmp_path / "keyed")
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", F.to_date("ts").alias("day")
    )
    events.repartition(4).write.parquet(raw)

    def run(ckpt):
        stream = (
            spark.readStream.schema(spark.read.parquet(raw).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )
        start_incremental_upsert(
            stream, table, ["day"], "user_id", ckpt
        ).awaitTermination()

    run(str(tmp_path / "ckpt1"))

    got = {
        (r.user_id, r.event_type, str(r.ts))
        for r in spark.read.parquet(table)
        .select("user_id", "event_type", "ts")
        .collect()
    }
    # batch expectation: latest event per user, ties broken identically
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_type"), F.desc("value"), F.desc("day")
    )
    want = {
        (r.user_id, r.event_type, str(r.ts))
        for r in events.withColumn("_rk", F.row_number().over(w))
        .filter("_rk = 1")
        .collect()
    }
    # per-key uniqueness always holds
    n_keys = events.select("user_id").distinct().count()
    assert spark.read.parquet(table).count() == n_keys
    assert got == want

    # replay everything with a fresh checkpoint: table must not change
    run(str(tmp_path / "ckpt2"))
    again = {
        (r.user_id, r.event_type, str(r.ts))
        for r in spark.read.parquet(table)
        .select("user_id", "event_type", "ts")
        .collect()
    }
    assert again == got


def test_incremental_span_dedup_equals_batch_keep_one(spark, sf_dir, tmp_path):
    """Streaming keep-one substring dedup: with batches in ascending
    doc_id order the accumulated cleaned output must EQUAL the batch
    q195 operator on the full corpus — keep-one never strips a first
    occurrence, so no retroactive rewrite is ever needed and the
    incremental decomposition is exact.  Also: replaying the last batch
    rewrites its partitions to the identical result."""
    from pyspark_anomaly_detection_spark.streaming.incremental import (
        span_dedup_batch,
        start_incremental_span_dedup,
    )
    from pyspark_anomaly_detection_spark.text.dedup import keep_one_dup_spans

    raw = str(tmp_path / "docs")
    store = str(tmp_path / "winhashes")
    out = str(tmp_path / "cleaned")
    ckpt = str(tmp_path / "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = 250
    # ascending-id batches: file order = arrival order under
    # maxFilesPerTrigger=1 (mirrors the exact-dedup test above)
    docs.filter(F.col("doc_id") < cut).coalesce(1).write.parquet(raw)
    docs.filter(F.col("doc_id") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    q = start_incremental_span_dedup(stream, store, out, ckpt)
    q.awaitTermination()

    got = spark.read.parquet(out)
    n_batches = got.select("batch_id").distinct().count()
    assert n_batches > 1, "maxFilesPerTrigger=1 must produce multiple batches"

    expected = {
        r.doc_id: r for r in keep_one_dup_spans(docs).collect()
    }
    rows = got.collect()
    assert len(rows) == len(expected)
    for r in rows:
        e = expected[r.doc_id]
        assert (r.n_tokens, r.kept_tokens, r.cleaned_text) == (
            e.n_tokens, e.kept_tokens, e.cleaned_text,
        ), f"doc {r.doc_id} diverges from batch keep-one"

    # at-least-once safety: replay the LAST batch by hand
    last_bid = max(r.batch_id for r in rows)
    before = sorted(
        (r.doc_id, r.kept_tokens, r.cleaned_text)
        for r in got.filter(F.col("batch_id") == last_bid).collect()
    )
    replay_df = docs.filter(F.col("doc_id") >= cut)
    span_dedup_batch(replay_df, last_bid, store, out)
    after_df = spark.read.parquet(out)
    after = sorted(
        (r.doc_id, r.kept_tokens, r.cleaned_text)
        for r in after_df.filter(F.col("batch_id") == last_bid).collect()
    )
    assert before == after, "replayed batch not idempotent"


def test_incremental_minhash_dedup_equals_batch_keep_first(
    spark, sf_dir, tmp_path
):
    """Streaming LSH near-dup dedup: with batches in ascending doc_id
    order the accumulated kept set must EQUAL the batch q204 operator on
    the full corpus — the min-id-per-bucket rule judges every doc
    against ALL earlier docs (kept or dropped), which is exactly what
    the every-seen-bucket store reproduces.  Also: replaying the last
    batch rewrites its partitions to the identical result."""
    from pyspark_anomaly_detection_spark.streaming.incremental import (
        minhash_dedup_batch,
        start_incremental_minhash_dedup,
    )
    from pyspark_anomaly_detection_spark.text.dedup import lsh_keep_first

    raw = str(tmp_path / "docs")
    store = str(tmp_path / "buckets")
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = 250
    docs.filter(F.col("doc_id") < cut).coalesce(1).write.parquet(raw)
    docs.filter(F.col("doc_id") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    q = start_incremental_minhash_dedup(stream, store, out, ckpt)
    q.awaitTermination()

    got = spark.read.parquet(out)
    n_batches = got.select("batch_id").distinct().count()
    assert n_batches > 1, "maxFilesPerTrigger=1 must produce multiple batches"

    expected_kept = {
        r.doc_id
        for r in lsh_keep_first(docs).filter(F.col("kept")).collect()
    }
    stream_kept = {r.doc_id for r in got.collect()}
    assert stream_kept == expected_kept, (
        f"stream != batch: only-stream="
        f"{sorted(stream_kept - expected_kept)[:5]} "
        f"only-batch={sorted(expected_kept - stream_kept)[:5]}"
    )
    # both batches contributed survivors and some docs were dropped
    assert 0 < len(stream_kept) < docs.count()

    # at-least-once safety: replay the LAST batch by hand
    rows = got.collect()
    last_bid = max(r.batch_id for r in rows)
    before = sorted(
        r.doc_id for r in rows if r.batch_id == last_bid
    )
    store_before = sorted(
        (r.band, tuple(r.band_sig))
        for r in spark.read.parquet(store).collect()
    )
    minhash_dedup_batch(docs.filter(F.col("doc_id") >= cut), last_bid, store, out)
    after = sorted(
        r.doc_id
        for r in spark.read.parquet(out)
        .filter(F.col("batch_id") == last_bid)
        .collect()
    )
    store_after = sorted(
        (r.band, tuple(r.band_sig))
        for r in spark.read.parquet(store).collect()
    )
    assert before == after, "replayed batch not idempotent (output)"
    assert store_before == store_after, "replayed batch not idempotent (store)"


def test_minhash_store_compaction_bounds_files_and_preserves_buckets(
    spark, sf_dir, tmp_path
):
    """N micro-batches leave N bucket-store partitions; compaction must
    fold all but the newest into the batch_id=-1 sentinel at the planned
    file count WITHOUT changing the occupied-bucket set, and a batch
    processed after compaction must still produce the same kept set as
    the full-corpus batch operator."""
    import glob

    from pyspark_anomaly_detection_spark.streaming.incremental import (
        compact_minhash_store,
        minhash_dedup_batch,
        start_incremental_minhash_dedup,
    )
    from pyspark_anomaly_detection_spark.text.dedup import lsh_keep_first

    raw = str(tmp_path / "docs")
    store = str(tmp_path / "buckets")
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cuts = [0, 100, 200, 300, 400]
    for lo, hi in zip(cuts, cuts[1:]):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(raw)

    stream = (
        spark.readStream.schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    start_incremental_minhash_dedup(stream, store, out, ckpt).awaitTermination()

    def bucket_set():
        return {
            (r.band, tuple(r.band_sig))
            for r in spark.read.parquet(store)
            .select("band", "band_sig")
            .distinct()
            .collect()
        }

    def store_files():
        return glob.glob(f"{store}/batch_id=*/*.parquet")

    n_parts_before = len(glob.glob(f"{store}/batch_id=*"))
    assert n_parts_before >= 4, "expected one store partition per batch"
    buckets_before = bucket_set()

    stats = compact_minhash_store(spark, store)
    assert stats["folded_batches"] == n_parts_before - 1
    # tiny store: the plan is a single file for all folded batches
    assert stats["files_written"] == 1
    assert len(glob.glob(f"{store}/batch_id=*")) == 2  # sentinel + newest
    assert len(store_files()) <= stats["files_written"] + 1
    assert bucket_set() == buckets_before, "fold changed the bucket set"

    # a second fold is a no-op (sentinel + one unfoldable batch)
    again = compact_minhash_store(spark, store)
    assert again == {"folded_batches": 0, "files_written": 0, "buckets": 0}

    # continuation correctness: process the remaining docs as a new batch
    # against the compacted store; accumulated kept == batch operator
    minhash_dedup_batch(docs.filter(F.col("doc_id") >= 400), 99, store, out)
    expected = {
        r.doc_id for r in lsh_keep_first(docs).filter(F.col("kept")).collect()
    }
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == expected
