"""Write-Audit-Publish: gated table publication with zero extra passes.

The reference validates AFTER writing (GX suite on the already-written
silver table, src/data/silver.py:42 — a second full read), and its
quarantine split runs multiple counts over the same lineage
(src/data/ingestion_pyspark.py:42-48, flagged in SURVEY §4.3).  The
scale-correct shape is Write-Audit-Publish:

1. **Write** to a staging path, attaching ``DataFrame.observe`` metrics —
   Spark's Observation API accumulates audit aggregates DURING the write
   job, so the audit costs zero additional scans.
2. **Audit** the observed metrics against expectations driver-side
   (a dict lookup, no job).
3. **Publish** by rename — a failed audit leaves the previous table
   untouched and the rejected data in staging for inspection.  The
   publish itself is two renames (table → ``__old``, staging → table),
   each return-value-checked so a failure raises before any delete;
   concurrent readers can still observe the brief window between the two
   renames where the table path is absent (single-writer,
   coordinated-reader semantics — a transactional format is the fix when
   readers are uncoordinated).

At 100 TB the saved re-read is hours; the rename is O(1) metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Observation, SparkSession


@dataclass(frozen=True)
class AuditResult:
    published: bool
    metrics: dict
    failures: list[str]


def audited_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    expectations: dict[str, Callable[[object], bool]],
    fmt: str = "parquet",
) -> AuditResult:
    """WAP publish of ``df`` to ``path``.

    ``metrics`` are aggregate expressions observed during the single write
    pass; each ``expectations[name](value)`` predicate runs driver-side on
    the observed value.  All expectations pass → staging renames over the
    target (previous version deleted).  Any failure → target left exactly
    as it was; staging kept at ``<path>__staging`` for debugging.  Every
    rename's boolean return is checked (Hadoop rename fails soft); a false
    return raises before any delete so the previous table is never lost.
    """
    spark = df.sparkSession
    obs = Observation("wap_audit")
    staging = path.rstrip("/") + "__staging"
    df.observe(obs, *[c.alias(n) for n, c in metrics.items()]).write.mode(
        "overwrite"
    ).format(fmt).save(staging)

    got = obs.get
    failures = [
        f"{name}: observed {got.get(name)!r}"
        for name, check in expectations.items()
        if not check(got.get(name))
    ]

    jvm = spark.sparkContext._jvm
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if failures:
        return AuditResult(published=False, metrics=dict(got), failures=failures)

    from ..io.maintenance import _rename_or_raise

    staged = jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(fs_path):
        old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
        # A stale __old from a crashed prior publish would fail the rename.
        if fs.exists(old):
            fs.delete(old, True)
        _rename_or_raise(fs, fs_path, old, "WAP publish (table -> __old)")
        try:
            _rename_or_raise(fs, staged, fs_path, "WAP publish (staging -> table)")
        except IOError:
            fs.rename(old, fs_path)  # restore: never leave the table missing
            raise
        fs.delete(old, True)
    else:
        _rename_or_raise(fs, staged, fs_path, "WAP publish (staging -> table)")
    return AuditResult(published=True, metrics=dict(got), failures=[])
