"""CLONE for deltalite tables (Delta's ``CREATE TABLE ... CLONE``).

A SHALLOW clone is a new table whose commit 0 references the source
snapshot's data files by ABSOLUTE path — zero bytes copied, so cloning
a 100 TB table is an O(|files|) metadata commit.  The clone then lives
its own life: DML is copy-on-write, so a rewrite materializes the
touched files INSIDE the clone and the source stays byte-identical;
appends land in the clone's directory; VACUUM on the clone only ever
walks the clone's directory, so it can never delete source data.  The
flip side is Delta's own caveat verbatim: VACUUM on the SOURCE can
delete files the clone still references — a shallow clone is a
dev/test snapshot, not a backup.

A DEEP clone copies the snapshot's data files into the target (and the
add actions keep relative paths) — an independent table equivalent to
the source snapshot.

Cloning preserves the snapshot's metadata wholesale under a fresh
table id: schema, partition columns, configuration (CHECK constraints
keep enforcing on the clone), generation expressions, column-mapping
state, protocol, and inline deletion-vector descriptors.  File-based
('u') DVs are rejected for shallow clones — their descriptor paths are
table-relative and would dangle (deep clones copy the DV files too).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import deltalite
from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state
from pyspark_anomaly_detection_spark.registry import register


def clone_delta(
    source_path: str,
    target_path: str,
    version: int | None = None,
    shallow: bool = True,
) -> dict[str, int]:
    """Clone ``source_path`` (at ``version``, latest when None) into a
    NEW table at ``target_path``.  Returns ``{version, files_referenced,
    bytes_copied}``."""
    if os.path.exists(os.path.join(target_path, deltalite._LOG_DIR)):
        raise ValueError(
            f"deltalite CLONE target already has a log: {target_path}"
        )
    snap = _snapshot_state(source_path, version)
    os.makedirs(os.path.join(target_path, deltalite._LOG_DIR), exist_ok=True)

    actions: list[dict[str, Any]] = []
    if snap.protocol is not None:
        actions.append({"protocol": snap.protocol})
    else:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
    meta = dict(snap.meta or {})
    meta["id"] = uuid.uuid4().hex  # a clone is a NEW table
    actions.append({"metaData": meta})

    bytes_copied = 0
    for rel in sorted(snap.adds):
        add = dict(snap.adds[rel])
        dv = add.get("deletionVector")
        if shallow:
            if dv and dv.get("storageType") == "u":
                # 'u' descriptors resolve table-relative and would
                # dangle from the clone — rewrite to the spec's
                # ABSOLUTE-path storage ('p') pointing at the source
                # table's DV file (round 13; was a fail-loud guard).
                # Offset/size/cardinality are unchanged: same file,
                # same entry.
                from pyspark_anomaly_detection_spark.io.deltalite_dv import (
                    _dv_file_path,
                )

                dv = dict(dv)
                dv["storageType"] = "p"
                dv["pathOrInlineDv"] = _dv_file_path(
                    source_path, dv["pathOrInlineDv"]
                )
                add["deletionVector"] = dv
            add["path"] = os.path.abspath(os.path.join(source_path, rel))
        else:
            src_file = os.path.join(source_path, rel)
            dst_file = os.path.join(target_path, rel)
            os.makedirs(os.path.dirname(dst_file), exist_ok=True)
            shutil.copyfile(src_file, dst_file)
            bytes_copied += os.path.getsize(dst_file)
            if dv and dv.get("storageType") == "u":
                # resolve the REAL DV file (pathOrInlineDv is a z85
                # uuid token, not a path — copying it verbatim raised
                # FileNotFoundError; latent bug fixed in round 13) and
                # copy it to the same relative location so the 'u'
                # descriptor keeps resolving inside the clone
                from pyspark_anomaly_detection_spark.io.deltalite_dv import (
                    _dv_file_path,
                )

                src_dv = _dv_file_path(source_path, dv["pathOrInlineDv"])
                dst_dv = os.path.join(
                    target_path, os.path.relpath(src_dv, source_path)
                )
                os.makedirs(os.path.dirname(dst_dv), exist_ok=True)
                if not os.path.exists(dst_dv):  # one file per commit
                    shutil.copyfile(src_dv, dst_dv)
                    bytes_copied += os.path.getsize(dst_dv)
        add["dataChange"] = True
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "operation": "CLONE",
                "operationParameters": {
                    "source": source_path,
                    "sourceVersion": str(snap.version),
                    "shallow": str(shallow).lower(),
                },
                "engineInfo": "deltalite",
            }
        }
    )
    new_version = deltalite._commit_with_retry(target_path, 0, actions)
    return {
        "version": new_version,
        "files_referenced": len(snap.adds),
        "bytes_copied": bytes_copied,
    }


@register(
    "q229_deltalite_shallow_clone",
    oracle="""
    SELECT 'clone_after_delete' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 4 <> 0
    UNION ALL
    SELECT 'source_untouched',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents
    ORDER BY phase
    """,
)
def q229_deltalite_shallow_clone(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shallow-clone lifecycle census: documents lands in a source
    table, a zero-copy CLONE references its files, a COW DELETE on the
    CLONE removes every 4th doc — rewriting the touched source-owned
    files INTO the clone — and both tables are censused.  The oracle
    recomputes both snapshots from documents: a green hash proves the
    clone diverged correctly AND the source never changed (copy-on-
    write isolation across the table boundary)."""
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="deltalite_clone_")
    src_t = os.path.join(base, "src_t")
    clone_t = os.path.join(base, "clone_t")
    try:
        write_delta(docs, src_t)
        clone_delta(src_t, clone_t)
        delete_delta(spark, clone_t, "doc_id % 4 = 0")

        def census(df: DataFrame, phase: str) -> DataFrame:
            return df.agg(
                F.lit(phase).alias("phase"),
                F.count("*").alias("n_rows"),
                F.sum("doc_id").alias("id_sum"),
            )

        result = (
            census(read_delta(spark, clone_t), "clone_after_delete")
            .unionByName(census(read_delta(spark, src_t), "source_untouched"))
            .orderBy("phase")
        )
        return detach_local(result)  # 2 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
