"""RESTORE for deltalite tables: roll the table state back to an
earlier version as a NEW commit (Delta's ``RESTORE TABLE ... TO
VERSION AS OF v``).

Restore is a log-level file-set reconciliation, not a data rewrite:
the commit re-adds exactly the data files active at the target version
that the current version no longer lists, and removes exactly the
files the current version added since — zero bytes of Parquet are
read or written, so restoring a 100 TB table is an O(|file diff|)
metadata operation.  History is preserved (the restore is itself a
commit), so time travel across the restore — including INTO the
rolled-back span — keeps working, and the change feed / streaming
source see the restore as ordinary remove+add actions with
``dataChange: true``, exactly how delta-spark's RestoreTableCommand
surfaces it.

Reference parity: delta-spark RestoreTableCommand (Delta is the
reference's storage layer, config/spark_config.py:24-26); same
semantics re-expressed on the deltalite log:

* metadata (schema / partition columns / configuration) is restored to
  the target version's when it differs — a post-target schema
  evolution is rolled back too;
* re-added files carry their target-version ``deletionVector``
  descriptor verbatim (restoring across a DV DELETE resurrects the
  DV'd view, and restoring TO a DV'd version re-applies the bitmap);
* files whose Parquet data was VACUUMed away cannot be restored —
  fail loud with the missing list (delta-spark's
  ``ERROR_FILES_DELETED`` check) rather than committing a snapshot
  that cannot be read.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import deltalite
from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state
from pyspark_anomaly_detection_spark.registry import register


def restore_delta(
    table_path: str, version: int, dry_run: bool = False
) -> dict[str, int]:
    """Restore ``table_path`` to ``version``; returns the reconciliation
    census ``{version, files_readded, files_removed, metadata_restored}``
    (``version`` is the NEW commit's number, or the current one when the
    diff is empty / ``dry_run``).

    Raises ``FileNotFoundError`` listing the paths when any file to
    re-add no longer exists physically (expired by VACUUM)."""
    cur = _snapshot_state(table_path)
    tgt = _snapshot_state(table_path, version)

    # re-add: in target but gone from current, OR still present with a
    # different row-visibility (deletionVector) / content identity
    def _ident(add: dict[str, Any]):
        return (add.get("deletionVector"), add.get("size"))

    to_add = [
        add
        for path, add in sorted(tgt.adds.items())
        if path not in cur.adds or _ident(cur.adds[path]) != _ident(add)
    ]
    to_remove = sorted(p for p in cur.adds if p not in tgt.adds)

    missing = [
        add["path"]
        for add in to_add
        if not os.path.exists(os.path.join(table_path, add["path"]))
    ]
    if missing:
        raise FileNotFoundError(
            f"deltalite RESTORE to version {version}: {len(missing)} data "
            f"file(s) no longer exist (expired by VACUUM): {missing[:5]}"
        )

    meta_restored = tgt.meta != cur.meta
    if dry_run or (not to_add and not to_remove and not meta_restored):
        return {
            "version": cur.version,
            "files_readded": len(to_add),
            "files_removed": len(to_remove),
            "metadata_restored": int(meta_restored),
        }

    actions: list[dict[str, Any]] = []
    if meta_restored:
        actions.append({"metaData": tgt.meta})
    actions += [
        {"remove": {"path": p, "dataChange": True}} for p in to_remove
    ]
    actions += [
        # the target add verbatim (stats, partitionValues, DV descriptor)
        # with dataChange forced True: a restore IS a data change even
        # when the original add was an OPTIMIZE rewrite (dataChange False)
        {"add": {**add, "dataChange": True}}
        for add in to_add
    ]
    actions.append(
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
                "engineInfo": "deltalite",
            }
        }
    )
    new_version = deltalite._commit_with_retry(
        table_path, cur.version + 1, actions
    )
    return {
        "version": new_version,
        "files_readded": len(to_add),
        "files_removed": len(to_remove),
        "metadata_restored": int(meta_restored),
    }


@register(
    "q231_deltalite_restore",
    oracle="""
    SELECT 'post_restore' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT 'v2_time_travel',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0
    ORDER BY phase
    """,
)
def q231_deltalite_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE lifecycle census: documents lands at v0, a COW DELETE
    removes every 3rd doc (v1), a second DELETE removes every 5th (v2),
    then RESTORE to v1 rolls the second delete back (v3).  The final
    snapshot must census exactly like v1 (the oracle recomputes it
    straight from documents), and time travel to the pre-restore v2
    must still show BOTH deletes — history survives the rollback."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.deltalite_dml import delete_delta
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="deltalite_restore_")
    table = os.path.join(base, "docs_t")
    try:
        write_delta(docs, table)  # v0
        delete_delta(spark, table, "doc_id % 3 = 0")  # v1
        delete_delta(spark, table, "doc_id % 5 = 0")  # v2
        restore_delta(table, version=1)  # v3 == v1 state

        def census(df: DataFrame, phase: str) -> DataFrame:
            return df.agg(
                F.lit(phase).alias("phase"),
                F.count("*").alias("n_rows"),
                F.sum("doc_id").alias("id_sum"),
            )

        result = (
            census(read_delta(spark, table), "post_restore")
            .unionByName(
                census(read_delta(spark, table, version=2), "v2_time_travel")
            )
            .orderBy("phase")
        )
        return detach_local(result)  # 2 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
