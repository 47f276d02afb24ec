"""Table maintenance: small-file compaction with sorted rewrite.

The operational complement of the sinks in ``writers.py``: streaming and
micro-batch ingest (``streaming/incremental.py``) accumulate many small
Parquet files per partition — at 100 TB that means metadata-bound scans
(every file open costs a NameNode/object-store round trip and its own
footer read) and useless min/max statistics.  Compaction rewrites a
table/partition into size-targeted files, optionally sorted so column
min/max footers become selective again (the poor man's Z-order for a
single dominant predicate column; multi-column layout is q115's Morton
key).

This is the same job Delta's OPTIMIZE (+ ZORDER) or Iceberg's
rewrite_data_files runs; expressed here with plain DataFrame primitives
so it works on any hive-layout Parquet table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # cluster default; tests shrink it


def plan_file_count(total_bytes: int, target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """Files needed to hold ``total_bytes`` at the target size (≥1)."""
    return max(1, math.ceil(total_bytes / target_file_bytes))


def _rename_or_raise(fs, src, dst, step: str) -> None:
    """Hadoop ``FileSystem.rename`` signals failure by returning false
    (dest exists, src missing, cross-filesystem move) rather than raising.
    Every swap step must check it: proceeding past a failed rename and then
    deleting the "old" copy is how you lose the only copy of a table.
    """
    if not fs.rename(src, dst):
        raise IOError(f"rename failed during {step}: {src} -> {dst}")


def _clear_leftover(fs, jvm, path_str: str) -> None:
    """Delete a stale staging/trash dir left by a crashed prior run, so its
    presence can't make this run's rename return false mid-swap.
    """
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    if fs.exists(p):
        fs.delete(p, True)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a Parquet directory into ``ceil(bytes/target)`` files.

    Sizing reads the actual on-disk bytes (Hadoop FS API via the JVM — no
    Python filesystem walk, so it works on any supported scheme, not just
    ``file:``).  With ``sort_by`` the rewrite range-partitions on the sort
    columns and sorts within each partition, so every output file covers a
    narrow, disjoint range and its footer min/max prunes reads (plain
    ``repartition`` + local sort would leave each file spanning the whole
    domain).  Returns the file count written.

    The rewrite stages to ``<path>__compact`` and swaps via two renames
    (table → ``__old``, staging → table), each checked — a failed rename
    raises before anything is deleted, so a crash or race never silently
    drops data.  The swap is NOT atomic for concurrent readers: between the
    two renames the table path briefly does not exist.  Single-writer,
    coordinated-reader tables only; for reader-transparent swaps use a
    transactional format (Delta/Iceberg OPTIMIZE).
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_conf = jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(hadoop_conf)
    total = fs.getContentSummary(src).getLength()
    n_files = plan_file_count(total, target_file_bytes)

    # A crashed prior run may have left __compact/__old behind; their
    # presence would fail this run's renames, so clear them first.
    _clear_leftover(fs, jvm, path.rstrip("/") + "__compact")
    _clear_leftover(fs, jvm, path.rstrip("/") + "__old")

    df = spark.read.parquet(path)
    if sort_by:
        compacted = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        compacted = df.repartition(n_files)

    staging = path.rstrip("/") + "__compact"
    compacted.write.mode("overwrite").parquet(staging)
    trash = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    staged = jvm.org.apache.hadoop.fs.Path(staging)
    _rename_or_raise(fs, src, trash, "compact swap (table -> __old)")
    try:
        _rename_or_raise(fs, staged, src, "compact swap (__compact -> table)")
    except IOError:
        # Second rename failed with the table path vacated: restore the
        # original so the table is never left missing.
        fs.rename(trash, src)
        raise
    fs.delete(trash, True)
    return n_files


def parquet_file_count(spark: SparkSession, path: str) -> int:
    """Data files (part-*) currently backing a Parquet directory."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(src, True)
    n = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("part-"):
            n += 1
    return n


def delete_keys(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    key_col: str,
    keys: DataFrame,
) -> dict[str, int]:
    """Targeted key deletion from a hive-partitioned Parquet table — the
    GDPR/right-to-be-forgotten write pattern: remove every row whose
    ``key_col`` is in ``keys`` by rewriting ONLY the partitions that
    contain such rows, via dynamic partition overwrite
    (``io.writers.overwrite_partitions``).

    Plan shape at 100 TB: one semi-join pass (keys broadcast — a deletion
    request list is small) finds the touched partitions; the rewrite then
    reads just those partitions back (partition pruning on the IN-list
    filter) and anti-joins the keys out.  Untouched partitions — the
    overwhelming majority — are never read or written.  Returns
    ``{"partitions_rewritten": …, "rows_deleted": …}``.
    """
    from pyspark.sql import functions as F

    from pyspark_anomaly_detection_spark.io.writers import overwrite_partitions

    table = spark.read.parquet(path)
    key_set = F.broadcast(keys.select(key_col).distinct())

    touched = (
        table.join(key_set, key_col, "left_semi")
        .select(*partition_by)
        .distinct()
        .collect()
    )
    if not touched:
        return {"partitions_rewritten": 0, "rows_deleted": 0}

    # IN-list filter over the partition columns → partition-pruned scan
    pred = None
    for row in touched:
        clause = None
        for col in partition_by:
            c = F.col(col) == F.lit(row[col])
            clause = c if clause is None else (clause & c)
        pred = clause if pred is None else (pred | clause)

    affected = table.filter(pred)
    kept = affected.join(key_set, key_col, "left_anti")
    n_before = affected.count()

    # Stage the survivors before overwriting: Spark refuses (or worse,
    # lazily re-reads) a path that the write is about to clobber.
    jvm = spark.sparkContext._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    staging = path.rstrip("/") + "__delete_staging"
    _clear_leftover(fs, jvm, staging)
    kept.write.mode("overwrite").parquet(staging)
    # explicit schema: an all-rows-deleted staging dir has no data files
    staged = spark.read.schema(kept.schema).parquet(staging)
    n_after = staged.count()
    if n_after > 0:
        overwrite_partitions(staged, path, partition_by)

    # Dynamic overwrite only touches partitions PRESENT in the written
    # frame — a partition whose every row was deleted must be removed
    # explicitly or its old files survive.
    kept_parts = {
        tuple(row[c] for c in partition_by)
        for row in staged.select(*partition_by).distinct().collect()
    }
    emptied = [
        row
        for row in touched
        if tuple(row[c] for c in partition_by) not in kept_parts
    ]
    for row in emptied:
        part_dir = "/".join(f"{c}={row[c]}" for c in partition_by)
        p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + part_dir)
        if fs.exists(p):
            fs.delete(p, True)
    _clear_leftover(fs, jvm, staging)
    return {
        "partitions_rewritten": len(touched),
        "rows_deleted": n_before - n_after,
    }
