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
3. **Publish** by atomic rename — readers either see the previous table
   or the complete new one, never a partial write — or abort, leaving
   the previous table untouched and the rejected data in staging for
   inspection.

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
    as it was; staging kept at ``<path>__staging`` for debugging.
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

    staged = jvm.org.apache.hadoop.fs.Path(staging)
    if fs.exists(fs_path):
        old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
        fs.rename(fs_path, old)
        fs.rename(staged, fs_path)
        fs.delete(old, True)
    else:
        fs.rename(staged, fs_path)
    return AuditResult(published=True, metrics=dict(got), failures=[])
