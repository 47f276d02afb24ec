"""Row-level DML on deltalite tables: DELETE, UPDATE, MERGE.

Delta's row-level mutations without deletion vectors are COPY-ON-WRITE:
find the data files that contain matching rows, rewrite ONLY those
files with the mutation applied, and commit remove+add atomically —
untouched files (the overwhelming majority under a selective predicate
at 100 TB) are never read twice, never rewritten, and stay byte-
identical.  This module implements that plan shape on the deltalite
log:

* a single scan with ``input_file_name()`` finds the touched files —
  driver state is one row per touched FILE, never per row;
* the rewrite reads only the touched files, applies the mutation
  declaratively (filter / CASE WHEN via Spark SQL expressions), and
  writes one commit's worth of new files;
* the commit removes exactly the touched files and adds the rewrites
  (``dataChange: true``), so time travel still sees the pre-DML rows
  and the change feed (:func:`~pyspark_anomaly_detection_spark.io.
  deltalite.read_delta_changes`) reports the rewrite as
  delete+insert — exactly how a real non-DV Delta DELETE surfaces.

Predicates/assignments are Spark SQL expression strings over DATA
columns; mutating partitioned tables is supported for predicates over
data columns (partition columns live only in the log, so a predicate
naming one raises up front rather than silently matching nothing).

MERGE implements the classic upsert contract (``WHEN MATCHED THEN
UPDATE SET * / WHEN NOT MATCHED THEN INSERT *``): each matched target
row is updated IN PLACE with its source row's values (duplicate-key
target rows keep their cardinality, exactly Delta's semantics),
unmatched source rows append, all in ONE commit; ambiguous sources
(duplicate keys) are rejected, mirroring Delta's
``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE``.  Round 12
adds the standard clause matrix: ``WHEN MATCHED [AND cond] THEN
DELETE``, conditional updates, insert-only merges (matched rows — and
their files — untouched), and no-insert merges; identity-column
targets allocate mid-rewrite for the insert branch (q230/q233).
Round 13 completes the matrix: ``WHEN NOT MATCHED BY SOURCE``
(delete, or UPDATE SET over the old row — q234's full snapshot-sync),
partition-MOVING matched updates (old group drops the row, the updated
row re-enters through the hive-layout insert path), token-validated
``src.<col>`` condition translation, and a size-conditional source
broadcast (big sources fall back to AQE-planned joins).
"""

from __future__ import annotations

import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import deltalite
from pyspark_anomaly_detection_spark.io.detach import detach_local
from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state


def _commit_actions(
    table_path: str, version: int, actions: list[dict[str, Any]]
) -> int:
    # optimistic concurrency with bounded retry: a DML rewrite carries
    # removes, so any interleaved data change aborts it (Delta's
    # ConcurrentAppend/ConcurrentDelete behavior); see
    # deltalite._commit_with_retry for the conflict matrix
    return deltalite._commit_with_retry(table_path, version, actions)


def _cm_io(snap):
    """Column-mapping translators for a snapshot, or None when the table
    is unmapped.  Returns ``(phys_schema, logical_names, phys_names)``
    over the DATA columns only (partition columns never live in data
    files — round 14, when CM × partitions landed): data files of a
    mapped table carry PHYSICAL column names, so every raw file read
    goes through the physical schema then renames to logical
    (predicates/assignments/transforms all operate in logical space),
    and every file write renames logical → physical just before the
    parquet sink — the same translation write_delta_mapped and
    _read_adds use (verdict r10 item 2: COW DML and OPTIMIZE were gated
    on mapped tables instead of taught this translation)."""
    mapping = deltalite._column_mapping_of(snap.schema_json)
    if not mapping:
        return None
    import json

    from pyspark.sql.types import StructField, StructType

    schema = StructType.fromJson(json.loads(snap.schema_json))
    data_fields = [
        f for f in schema.fields if f.name not in (snap.part_cols or [])
    ]
    phys_schema = StructType(
        [
            StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
            for f in data_fields
        ]
    )
    logical = [f.name for f in data_fields]
    physical = [mapping.get(n, n) for n in logical]
    return phys_schema, logical, physical


def _read_files(
    spark: SparkSession,
    table_path: str,
    rels,
    cmio,
    snap=None,
    file_col: "str | None" = None,
) -> DataFrame:
    """Read data files as a LOGICAL-name frame (physical-schema read +
    rename when the table is column-mapped), subtracting any DELETION
    VECTORS carried by the snapshot's adds (round 14: COW DML runs on
    DV tables by reading touched files THROUGH their bitmaps — the
    rewrite then drops the file's DV in the same commit).  ``file_col``
    appends each row's source-file path (URI for plain files, normalized
    absolute path for DV files — ``_scan_file_to_local`` handles both)
    for the touched-file scans."""
    dv_map = (
        {
            r: snap.adds[r]
            for r in rels
            if (snap.adds.get(r) or {}).get("deletionVector")
        }
        if snap is not None
        else {}
    )
    plain = [r for r in rels if r not in dv_map]
    phys_schema = logical = None
    if cmio is not None:
        phys_schema, logical, _ = cmio
    pieces: list[DataFrame] = []
    if plain:
        paths = [os.path.join(table_path, rel) for rel in plain]
        if cmio is None:
            df = spark.read.parquet(*paths)
        else:
            df = spark.read.schema(phys_schema).parquet(*paths).toDF(*logical)
        if file_col:
            df = df.withColumn(file_col, F.input_file_name())
        pieces.append(df)
    if dv_map:
        from pyspark_anomaly_detection_spark.io.deltalite_dv import (
            read_files_minus_dv,
        )

        df = read_files_minus_dv(
            spark, table_path, dv_map, phys_schema, file_col=file_col
        )
        if cmio is not None:
            # physical → logical; the optional file column trails the
            # schema fields (read_files_minus_dv appends it last)
            df = df.toDF(*(logical + ([file_col] if file_col else [])))
        pieces.append(df)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _to_physical(df: DataFrame, cmio) -> DataFrame:
    """Rename a logical-name frame to physical names for the file write
    (identity when unmapped)."""
    if cmio is None:
        return df
    _, logical, physical = cmio
    return df.select(*logical).toDF(*physical)


def _translate_matched_condition(
    cond: str, key: str, aliased_cols: set[str]
) -> str:
    """Translate a WHEN MATCHED AND <cond> predicate onto the joined
    frame: ``src.<col>`` → ``_dml_src_<col>`` for every column the join
    aliased, ``src.<key>`` → the bare key (equal on a matched row by the
    ON clause), bare names read the target.

    A real token pass, not string replacement (ADVICE r12 medium):
    ``src.<name>`` is matched on word boundaries so ``src.id`` never
    corrupts ``src.id_ts``, single-quoted SQL string literals pass
    through untouched ('' is the in-literal escape), and a ``src.*``
    reference that is not an aliased source column raises instead of
    silently reading the target."""
    import re

    def repl(m: "re.Match[str]") -> str:
        col = m.group(1)
        if col == key:
            return key
        if col not in aliased_cols:
            raise ValueError(
                f"merge_delta: matched_condition references src.{col}, "
                "which is not a usable source column here (source data "
                "columns only — identity and partition columns cannot "
                "be referenced via src.)"
            )
        return f"_dml_src_{col}"

    out: list[str] = []
    for i, seg in enumerate(re.split(r"('(?:[^']|'')*')", cond)):
        out.append(seg if i % 2 else re.sub(r"\bsrc\.(\w+)", repl, seg))
    return "".join(out)


def _scan_file_to_local(path: str) -> str:
    """``input_file_name()`` URI → plain decoded local path: strip the
    ``file:`` scheme and percent-DECODE URI escapes — hive partition
    directories with special characters arrive URI-encoded from the
    scan but live decoded on disk and in the log's add paths (round
    13).  ``unquote`` (not ``unquote_plus``) keeps literal ``+``."""
    import re
    from urllib.parse import unquote

    if path.startswith("file:"):
        path = re.sub(r"^file:/*", "/", path)
    return unquote(path)


def _guard_partition_columns(predicate: str, part_cols: list[str]) -> None:
    import re

    for col in part_cols:
        if re.search(rf"\b{re.escape(col)}\b", predicate):
            raise ValueError(
                f"deltalite DML predicate references partition column "
                f"'{col}' — partition columns live only in the log; use "
                "replace_where / partition_filter flows for partition-"
                "scoped operations"
            )


def _resolved_add_keys(table_path: str, rels) -> dict[str, str]:
    """Resolved absolute file path → add key, for mapping scan-reported
    file paths back to the log's add actions.  Handles both relative
    adds and the ABSOLUTE adds a shallow CLONE commits (ADVICE r13: the
    MERGE scans used ``os.path.relpath`` instead, so MERGE on a shallow
    clone crashed with a KeyError while DELETE/UPDATE worked)."""
    return {
        os.path.abspath(os.path.join(table_path, rel)): rel for rel in rels
    }


def _touched_files(
    spark: SparkSession,
    table_path: str,
    files: list[str],
    predicate: str,
    cmio=None,
    snap=None,
) -> tuple[list[str], int]:
    """(relative paths of active files containing at least one LIVE row
    matching ``predicate``, total matching live rows) — deletion-vector
    rows excluded.  ONE distributed scan serves both the touched-file
    set and the match count (VERDICT r16 item 4: DELETE/UPDATE used to
    pay a second scan of the touched files just to count matches — a
    per-file COUNT groupBy gets both answers from the same pass; files
    outside the touched set contribute zero matches by definition, so
    the sum over touched files IS the global match count).  Driver
    result stays bounded by file count."""
    if not files:
        return [], 0
    scan = (
        _read_files(
            spark, table_path, files, cmio, snap=snap, file_col="_dml_file"
        )
        .filter(F.expr(predicate))
        .groupBy("_dml_file")
        .count()
    )
    resolved = _resolved_add_keys(table_path, files)
    out = []
    n_match = 0
    for r in scan.collect():
        path = _scan_file_to_local(r._dml_file)
        out.append(resolved[os.path.abspath(path)])
        n_match += r["count"]
    return sorted(out), int(n_match)


def _cdf_enabled(snap) -> bool:
    """True when the table records row-level change data (Delta's
    ``delta.enableChangeDataFeed`` property — set via
    ``set_table_properties``).  Only then do DML rewrites pay the extra
    touched-file scan that materializes ``_change_data`` files; without
    it the batch CDF reconstructs file-level changes from add/remove
    actions as before."""
    conf = ((snap.meta or {}).get("configuration") or {})
    return conf.get("delta.enableChangeDataFeed") == "true"


def _rewrite_commit(
    spark: SparkSession,
    table_path: str,
    touched: list[str],
    transform,
    operation: str,
    extra_adds_df: DataFrame | None = None,
    snap=None,
    cmio=None,
    new_schema_json: "str | None" = None,
    transform_with_pv: bool = False,
    cdc_df: "DataFrame | None" = None,
) -> dict[str, int]:
    """Copy-on-write commit: rewrite ``touched`` files through
    ``transform`` (DataFrame -> DataFrame; with
    ``transform_with_pv=True`` it is called as ``transform(df,
    partition_values)`` so a partitioned rewrite can route rows by the
    file group's own partition tuple — MERGE's partition-move path
    needs this), optionally append
    ``extra_adds_df`` rows, remove+add atomically.  When
    ``new_schema_json`` is given the commit also carries a metaData
    action with that schemaString (same table id / partition columns /
    configuration) — MERGE's identity-allocation path uses this to bump
    the high-water mark in the SAME commit as the inserted rows, so a
    reader of any version sees marks consistent with the data.

    Partition-aware (ADVICE r9, high): touched files of a partitioned
    table carry NO partition columns in their data (Delta contract —
    the values live only in the log's ``partitionValues``), so the
    rewrite groups touched files by their partition tuple and commits
    each group's new files with THAT tuple reinjected — otherwise every
    rewritten row would read back with NULL partition columns."""
    snap = snap if snap is not None else _snapshot_state(table_path)
    version = snap.version + 1
    commit_dir = f"part-{version:05d}-{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table_path, commit_dir)

    # generated columns recompute on every rewrite (Delta's UPDATE
    # semantics: the expression, not the stale/stated value, wins) —
    # one withColumn per generated column, stays in codegen.  Generated
    # PARTITION columns are different (round 14): they never live in
    # data files (their value is the group's partitionValues, reinjected
    # on read), so the data-file transform must NOT materialize them;
    # the hive-layout insert path computes them for ROUTING only
    # (partitionBy strips them from the files again).
    from pyspark_anomaly_detection_spark.io.deltalite_generated import (
        generated_columns_of,
    )

    all_gen = generated_columns_of(snap.schema_json)
    part_gen = {c: e for c, e in all_gen.items() if c in snap.part_cols}
    gen_exprs = {c: e for c, e in all_gen.items() if c not in snap.part_cols}
    if gen_exprs:
        inner_transform = transform

        def transform(df: DataFrame, pv=None) -> DataFrame:  # noqa: F811
            out = (
                inner_transform(df, pv)
                if transform_with_pv
                else inner_transform(df)
            )
            for col, expr in gen_exprs.items():
                out = out.withColumn(col, F.expr(expr))
            return out

    if extra_adds_df is not None:
        for col, expr in gen_exprs.items():
            extra_adds_df = extra_adds_df.withColumn(col, F.expr(expr))
        for col, expr in part_gen.items():
            if col not in extra_adds_df.columns:
                extra_adds_df = extra_adds_df.withColumn(col, F.expr(expr))

    # group touched files by partition tuple (one group, {}, when
    # unpartitioned — the write lands at the commit dir root, the
    # pre-partitioning layout)
    groups: dict[tuple, list[str]] = {}
    for rel in touched:
        pv = snap.adds[rel].get("partitionValues") or {}
        groups.setdefault(tuple(sorted(pv.items())), []).append(rel)

    actions: list[dict[str, Any]] = []
    n_new_files = 0

    def _write_piece(
        df: DataFrame, subdir: str, pv: dict[str, str]
    ) -> list[dict[str, Any]]:
        """Write one group's rewrite and RETURN its add actions (the
        caller extends ``actions`` in group order — keeps the commit
        JSON byte-stable when groups write concurrently)."""
        out_dir = os.path.join(data_dir, subdir) if subdir else data_dir
        _to_physical(df, cmio).write.mode("error").parquet(out_dir)
        adds: list[dict[str, Any]] = []
        for name in sorted(os.listdir(out_dir)):
            if not name.endswith(".parquet"):
                continue
            rel = (
                f"{commit_dir}/{subdir}/{name}"
                if subdir
                else f"{commit_dir}/{name}"
            )
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": pv,
                        "size": os.path.getsize(os.path.join(out_dir, name)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
        return adds

    # a mapped table's partitionValues are keyed by PHYSICAL names; the
    # transform (merge's partition-move check) works in logical space
    full_mapping = deltalite._column_mapping_of(snap.schema_json)
    phys_to_logical = {p: n for n, p in full_mapping.items()}

    def _logical_pv(pv_items) -> dict:
        return {
            phys_to_logical.get(k, k): v for k, v in dict(pv_items).items()
        }

    ordered_groups = sorted(
        groups.items(), key=lambda kv: tuple(map(str, kv[0]))
    )

    def _rewrite_group(i: int, pv_items, rels) -> list[dict[str, Any]]:
        # DV-carrying touched files are read THROUGH their bitmaps: the
        # rewrite materializes the deletes, and the remove+add drops the
        # file's DV in this same commit (round 14 — real Delta's COW-on-
        # DV-table behavior; the guard that forced a REORG PURGE first
        # is gone)
        piece = _read_files(spark, table_path, rels, cmio, snap=snap)
        kept = (
            transform(piece, _logical_pv(pv_items))
            if transform_with_pv
            else transform(piece)
        )
        subdir = f"g{i}" if snap.part_cols else ""
        return _write_piece(kept, subdir, dict(pv_items))

    if len(ordered_groups) <= 1:
        for i, (pv_items, rels) in enumerate(ordered_groups):
            piece = _read_files(spark, table_path, rels, cmio, snap=snap)
            kept = (
                transform(piece, _logical_pv(pv_items))
                if transform_with_pv
                else transform(piece)
            )
            if extra_adds_df is not None and not snap.part_cols:
                kept = kept.unionByName(extra_adds_df)
                extra_adds_df = None  # folded into the single group's write
            subdir = f"g{i}" if snap.part_cols else ""
            adds = _write_piece(kept, subdir, dict(pv_items))
            actions.extend(adds)
            n_new_files += len(adds)
    else:
        # Partition groups rewrite to DISJOINT subdirs with no shared
        # state — submit them from a small driver thread pool so group
        # k+1's tasks back-fill executors while group k's tail finishes
        # (guide §2.6; r17: multi-partition COW DML paid one ~1 s
        # mostly-fixed-overhead job per group, serialized).  extra_adds
        # folding never reaches this branch: >1 group implies a
        # partitioned table, whose inserts go through the hive-layout
        # write below.  pool.map preserves group order, so the commit's
        # action sequence is identical to the sequential form.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(4, len(ordered_groups))
        ) as pool:
            for adds in pool.map(
                lambda t: _rewrite_group(t[0], *t[1]),
                enumerate(ordered_groups),
            ):
                actions.extend(adds)
                n_new_files += len(adds)
    if extra_adds_df is not None and not snap.part_cols:
        # no touched files (pure-insert MERGE on an unpartitioned table)
        adds = _write_piece(extra_adds_df, "", {})
        actions.extend(adds)
        n_new_files += len(adds)
    elif extra_adds_df is not None:
        # partitioned inserts (MERGE): hive-layout write inside the
        # commit dir, partitionValues harvested from the dir segments —
        # the same contract write_delta uses.  Mapped tables rename ALL
        # columns (data + partition) logical → physical so the hive dirs
        # and harvested pv keys land physical (round 14)
        ins_dir = os.path.join(data_dir, "inserts")
        ins = extra_adds_df
        part_names = snap.part_cols
        if full_mapping:
            ins = ins.toDF(
                *[full_mapping.get(c, c) for c in ins.columns]
            )
            part_names = [full_mapping.get(c, c) for c in snap.part_cols]
        ins.write.mode("error").partitionBy(*part_names).parquet(ins_dir)
        for root, _dirs, files in os.walk(ins_dir):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                pvals: dict[str, str] = {}
                for seg in os.path.relpath(root, ins_dir).split(os.sep):
                    if "=" in seg:
                        k, _, v = seg.partition("=")
                        pvals[k] = v
                actions.append(
                    {
                        "add": {
                            "path": os.path.relpath(full, table_path),
                            "partitionValues": pvals,
                            "size": os.path.getsize(full),
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                n_new_files += 1

    # CHECK constraints + generated-column equalities: UPDATE/MERGE can
    # introduce violating or drifted rows — one columnar scan of the
    # staged rewrite (touched files only, never the table) before the
    # commit; a violation aborts with nothing visible
    if n_new_files:
        from pyspark_anomaly_detection_spark.io.deltalite_constraints import (
            check_constraints_of,
            enforce_check_constraints,
        )
        from pyspark_anomaly_detection_spark.io.deltalite_generated import (
            generation_constraints,
        )

        cons = {
            **check_constraints_of(snap.meta),
            **generation_constraints(snap.schema_json),
        }
        # generated PARTITION columns never live in data files — their
        # equality can't be checked on the staged scan (round 14); the
        # hive routing / partition-move machinery carries their value
        for c in snap.part_cols:
            cons.pop(f"generated:{c}", None)
        if cons:
            # constraints are stored in LOGICAL names; a mapped table's
            # staged files carry physical names, so translate first.
            # recursiveFileLookup disables partition-directory inference:
            # a partitioned MERGE's commit dir mixes flat rewrite groups
            # (g0/…) with a hive-layout inserts/ tree, which inference
            # rejects (CONFLICTING_DIRECTORY_STRUCTURES — round-13 bug
            # surfaced by the generated-column × partition-move pin);
            # constraints reference DATA columns only, which every
            # staged file carries uniformly
            reader = spark.read.option("recursiveFileLookup", "true")
            staged = (
                reader.schema(cmio[0]).parquet(data_dir).toDF(*cmio[1])
                if cmio is not None
                else reader.parquet(data_dir)
            )
            enforce_check_constraints(staged, cons, operation)

    # row-level change data (round 14 — verdict r13 item 3): write the
    # commit's exact change set as spec-shaped ``_change_data`` files +
    # ``cdc`` actions (hive-partitioned like the table, physical names
    # on mapped tables, ``_change_type`` as a physical column).  Per the
    # protocol, when a commit carries cdc actions they are the COMPLETE
    # change description — CDF readers use them INSTEAD of the
    # file-level add/remove reconstruction, so a 1-row UPDATE in a
    # 1M-row file feeds exactly 1 preimage + 1 postimage downstream.
    if cdc_df is not None:
        cdc_dir = os.path.join(table_path, "_change_data", commit_dir)
        cdc_out = cdc_df
        part_names = snap.part_cols
        if full_mapping:
            cdc_out = cdc_out.toDF(
                *[full_mapping.get(c, c) for c in cdc_out.columns]
            )
            part_names = [full_mapping.get(c, c) for c in snap.part_cols]
        w = cdc_out.write.mode("error")
        if part_names:
            w = w.partitionBy(*part_names)
        w.parquet(cdc_dir)
        for root, _dirs, files in os.walk(cdc_dir):
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                pvals: dict[str, str] = {}
                for seg in os.path.relpath(root, cdc_dir).split(os.sep):
                    if "=" in seg:
                        k, _, val = seg.partition("=")
                        pvals[k] = val
                actions.append(
                    {
                        "cdc": {
                            "path": os.path.relpath(full, table_path),
                            "partitionValues": pvals,
                            "size": os.path.getsize(full),
                            "dataChange": False,
                        }
                    }
                )

    removes = [
        {"remove": {"path": rel, "dataChange": True}} for rel in touched
    ]
    meta_actions: list[dict[str, Any]] = []
    if new_schema_json is not None:
        # start from the FULL prior metaData and override only what this
        # commit changes (ADVICE r12 low: rebuilding from a fixed field
        # subset silently dropped unknown fields like name/description)
        meta = dict(snap.meta or {})
        meta["id"] = meta.get("id") or uuid.uuid4().hex
        meta["format"] = meta.get("format") or {
            "provider": "parquet",
            "options": {},
        }
        # the table id is STABLE across commits (Delta's contract);
        # only the schemaString changes here
        meta["schemaString"] = new_schema_json
        meta["partitionColumns"] = snap.part_cols
        meta["configuration"] = dict(meta.get("configuration") or {})
        meta.setdefault("createdTime", 0)
        meta_actions.append({"metaData": meta})
    actions = meta_actions + removes + actions + [
        {"commitInfo": {"operation": operation, "engineInfo": "deltalite"}}
    ]
    version = _commit_actions(table_path, version, actions)
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_added": n_new_files,
    }


def delete_delta(
    spark: SparkSession, table_path: str, predicate: str
) -> dict[str, int]:
    """Row-level DELETE: copy-on-write rewrite of exactly the files
    containing matching rows.  Returns {'version', 'files_rewritten',
    'files_added', 'files_untouched', 'rows_deleted'}."""
    snap = _snapshot_state(table_path)
    cmio = _cm_io(snap)
    if snap.part_cols:
        _guard_partition_columns(predicate, snap.part_cols)
    active = sorted(snap.adds)
    touched, n_match = _touched_files(
        spark, table_path, active, predicate, cmio, snap=snap
    )
    if not touched:
        return {
            "version": snap.version,
            "files_rewritten": 0,
            "files_added": 0,
            "files_untouched": len(active),
            "rows_deleted": 0,
        }
    cdc_df = None
    if _cdf_enabled(snap):
        # full logical rows (partition columns reinjected) of exactly
        # the deleted set — one extra scan of ONLY the touched files
        pre = deltalite._read_adds(
            spark,
            table_path,
            {r: snap.adds[r] for r in touched},
            snap.schema_json,
            snap.part_cols,
        )
        cdc_df = pre.filter(F.expr(predicate)).withColumn(
            "_change_type", F.lit("delete")
        )
    out = _rewrite_commit(
        spark,
        table_path,
        touched,
        lambda df: df.filter(~F.expr(predicate)),
        "DELETE",
        snap=snap,
        cmio=cmio,
        cdc_df=cdc_df,
    )
    out["files_untouched"] = len(active) - len(touched)
    out["rows_deleted"] = n_match
    return out


def update_delta(
    spark: SparkSession,
    table_path: str,
    predicate: str,
    assignments: dict[str, str],
) -> dict[str, int]:
    """Row-level UPDATE ... SET: rewrite only the files containing
    matching rows, applying ``assignments`` (column -> Spark SQL
    expression) to the matching rows and passing the rest through
    unchanged."""
    snap = _snapshot_state(table_path)
    cmio = _cm_io(snap)
    from pyspark_anomaly_detection_spark.io.deltalite_generated import (
        generated_columns_of,
    )

    gen = generated_columns_of(snap.schema_json)
    from pyspark_anomaly_detection_spark.io.deltalite_identity import (
        identity_columns_of,
    )

    idcols = identity_columns_of(snap.schema_json)
    for col in assignments:
        if col in gen:
            raise ValueError(
                f"cannot UPDATE generated column '{col}' — it is "
                f"GENERATED ALWAYS AS ({gen[col]}) and recomputes from "
                "its sources (Delta's rule)"
            )
        if col in idcols:
            raise ValueError(
                f"cannot UPDATE identity column '{col}' — it is "
                "GENERATED ALWAYS AS IDENTITY (Delta's rule)"
            )
    if snap.part_cols:
        _guard_partition_columns(predicate, snap.part_cols)
        import re as _re

        for col in assignments:
            if col in snap.part_cols:
                raise ValueError(
                    f"cannot UPDATE partition column '{col}'"
                )
            # a generated PARTITION column's value is the file group's
            # committed partitionValues — updating one of its SOURCES
            # would silently leave the row in the stale partition
            # (round 14: probed — the rewrite stayed in the old group
            # while the expression now implies another)
            for pcol in snap.part_cols:
                expr = gen.get(pcol)
                if expr and _re.search(rf"\b{_re.escape(col)}\b", expr):
                    raise ValueError(
                        f"cannot UPDATE column '{col}': partition "
                        f"column '{pcol}' is GENERATED ALWAYS AS "
                        f"({expr}) from it — the update would move "
                        "rows between partitions; use MERGE (whose "
                        "partition-move path handles this) instead"
                    )
    active = sorted(snap.adds)
    touched, n_match = _touched_files(
        spark, table_path, active, predicate, cmio, snap=snap
    )
    if not touched:
        return {
            "version": snap.version,
            "files_rewritten": 0,
            "files_added": 0,
            "rows_updated": 0,
        }

    def apply_set(df: DataFrame) -> DataFrame:
        cond = F.expr(predicate)
        for col, expr in assignments.items():
            df = df.withColumn(
                col, F.when(cond, F.expr(expr)).otherwise(F.col(col))
            )
        return df

    cdc_df = None
    if _cdf_enabled(snap):
        pre = deltalite._read_adds(
            spark,
            table_path,
            {r: snap.adds[r] for r in touched},
            snap.schema_json,
            snap.part_cols,
        ).filter(F.expr(predicate))
        # ONE select so every assignment reads the OLD row, then
        # generated columns recompute — mirroring the rewrite itself
        post = pre.select(
            *[
                F.expr(assignments[c]).alias(c)
                if c in assignments
                else F.col(c)
                for c in pre.columns
            ]
        )
        for col, expr in gen.items():
            post = post.withColumn(col, F.expr(expr))
        cdc_df = pre.withColumn(
            "_change_type", F.lit("update_preimage")
        ).unionByName(
            post.withColumn("_change_type", F.lit("update_postimage"))
        )
    out = _rewrite_commit(
        spark,
        table_path,
        touched,
        apply_set,
        "UPDATE",
        snap=snap,
        cmio=cmio,
        cdc_df=cdc_df,
    )
    out["rows_updated"] = n_match
    return out


def merge_delta(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    key: str,
    matched: "str | None" = "update",
    matched_condition: "str | None" = None,
    insert: bool = True,
    not_matched_by_source: "str | None" = None,
    not_matched_by_source_condition: "str | None" = None,
    not_matched_by_source_set: "dict[str, str] | None" = None,
) -> dict[str, int]:
    """MERGE INTO target USING source ON target.key = source.key —
    one copy-on-write commit, with Delta's standard clause variants
    (rounds 12-13):

    * ``matched="update"`` (default) — WHEN MATCHED THEN UPDATE SET *:
      matched target rows update in place (duplicate-key target rows
      each update, preserving cardinality).
    * ``matched="delete"`` — WHEN MATCHED THEN DELETE: matched rows are
      removed instead (the CDC tombstone-apply shape).
    * ``matched=None`` — no matched clause: matched rows are untouched
      (with ``insert=True`` this is the insert-only / dedup-append
      MERGE, the idempotent-ingest pattern).
    * ``matched_condition`` — SQL predicate gating the matched clause
      (WHEN MATCHED AND <cond>); rows failing it stay untouched.
      Target columns by bare name, source columns as ``src.<col>``
      (e.g. ``"src.updated_at > updated_at"`` — the CDC freshness
      guard).
    * ``insert=False`` — no WHEN NOT MATCHED clause: unmatched source
      rows are ignored.
    * ``not_matched_by_source="delete"|"update"`` (round 13) — Delta's
      WHEN NOT MATCHED BY SOURCE clause: target rows whose key has NO
      source row are deleted, or updated via
      ``not_matched_by_source_set`` ({column: SQL expr} over the OLD
      row — the SCD soft-delete / staleness-flag shape).  With
      ``matched="update"`` + ``insert=True`` + delete-by-source this is
      the full snapshot-sync MERGE: afterwards the table EQUALS the
      source.  The optional condition references TARGET columns only
      (no source row exists to reference).  Cost note, same as real
      Delta's: without a selective condition every file holding an
      unmatched row is rewritten.

    Duplicate source keys raise (Delta's multiple-source-rows-match
    error).  Source must carry the target's full schema (minus identity
    columns, which the insert branch allocates).

    Partitioned tables are supported (round 10) as long as the merge
    key is a DATA column; a matched UPDATE row whose source partition
    values differ MOVES partitions (round 13: delete from the old
    group's rewrite + insert into the new partition); inserts land in
    their own partitions via a hive-layout write."""
    if matched not in ("update", "delete", None):
        raise ValueError(
            f"merge_delta: matched must be 'update', 'delete', or None, "
            f"got {matched!r}"
        )
    if matched is None and matched_condition is not None:
        raise ValueError(
            "merge_delta: matched_condition without a matched clause"
        )
    if not_matched_by_source not in ("update", "delete", None):
        raise ValueError(
            "merge_delta: not_matched_by_source must be 'update', "
            f"'delete', or None, got {not_matched_by_source!r}"
        )
    if not_matched_by_source is None and (
        not_matched_by_source_condition is not None
        or not_matched_by_source_set is not None
    ):
        raise ValueError(
            "merge_delta: not_matched_by_source_condition/_set without "
            "a not_matched_by_source clause"
        )
    if not_matched_by_source == "update" and not not_matched_by_source_set:
        raise ValueError(
            "merge_delta: not_matched_by_source='update' needs "
            "not_matched_by_source_set assignments"
        )
    if not_matched_by_source == "delete" and not_matched_by_source_set:
        raise ValueError(
            "merge_delta: not_matched_by_source_set with a DELETE clause"
        )
    if not_matched_by_source_condition is not None:
        import re as _re

        if _re.search(r"\bsrc\.", not_matched_by_source_condition):
            raise ValueError(
                "merge_delta: not_matched_by_source_condition cannot "
                "reference src.* — no source row exists for these rows"
            )
    if matched is None and not insert and not_matched_by_source is None:
        raise ValueError("merge_delta: no clauses — nothing to do")
    snap = _snapshot_state(table_path)
    from pyspark_anomaly_detection_spark.io.deltalite_identity import (
        identity_columns_of,
    )

    # identity columns (GENERATED ALWAYS AS IDENTITY): the source must
    # not provide them; the UPDATE branch keeps the target's values; the
    # INSERT branch allocates above the committed high-water mark with
    # write_delta's distributed per-partition-offset scheme, and the
    # bumped mark commits atomically with the rows (new_schema_json).
    idcols = identity_columns_of(snap.schema_json)
    for col in idcols:
        if col in source.columns:
            raise ValueError(
                f"merge_delta: identity column '{col}' is GENERATED "
                "ALWAYS — the MERGE source cannot provide it "
                "(allowExplicitInsert is false)"
            )
    if key in idcols:
        raise ValueError(
            "merge_delta: the merge key cannot be an identity column — "
            "the source cannot carry GENERATED ALWAYS values to match on"
        )
    # GENERATED columns the source omits behave like identity columns
    # in the plumbing (round 14): never read from the source — the
    # rewrite recomputes them from their expressions anyway, so a
    # source that provides only the key (the NMBS-only merge shape) or
    # only the generating columns works.  A source that DOES provide
    # them keeps the old validation path (the recompute overwrites).
    from pyspark_anomaly_detection_spark.io.deltalite_generated import (
        generated_columns_of as _gen_of,
    )

    gen_map = _gen_of(snap.schema_json)
    gencols = set(gen_map)
    absent_gen = {c for c in gencols if c not in source.columns}
    cmio = _cm_io(snap)
    part_cols = snap.part_cols
    if key in part_cols:
        raise ValueError(
            "merge_delta: the merge key cannot be a partition column — "
            "keys are matched inside data files, and partition columns "
            "live only in the log"
        )
    active = sorted(snap.adds)
    src = source.cache()
    try:
        # ONE job over the (now cached) source serves both the ambiguity
        # check and the source count (VERDICT r16 item 4: these were two
        # separate jobs, the dupe check not even cache-backed): max
        # per-key cardinality > 1 ⇔ duplicate keys, Σ = n_src.  groupBy
        # buckets NULL keys together, so duplicate NULL keys reject too.
        stats = (
            src.groupBy(key)
            .agg(F.count("*").alias("_c"))
            .agg(F.sum("_c").alias("n"), F.max("_c").alias("mx"))
            .first()
        )
        if int(stats.mx or 0) > 1:
            raise ValueError(
                "merge_delta: multiple source rows share a key — "
                "ambiguous MERGE (Delta rejects this too)"
            )
        n_src = int(stats.n or 0)  # == distinct keys (dupes rejected)
        # 100 TB shape: the source side of every MERGE join is broadcast
        # only while it is broadcast-sized (the common CDC-batch case);
        # a big source falls back to plain joins and lets AQE pick the
        # strategy — a forced broadcast of a huge source would OOM every
        # executor (round 13)
        _bcast = (
            F.broadcast if n_src <= 1_000_000 else (lambda df: df)
        )
        # one scan finds the files holding matched LIVE keys (DV rows
        # excluded); scan paths map back through the resolved-abspath →
        # add-key table so shallow-clone absolute adds resolve too
        resolved = _resolved_add_keys(table_path, active)
        touched: list[str] = []
        n_matched = 0
        n_matched_keys = 0
        if active and n_src:
            scan = (
                _read_files(
                    spark,
                    table_path,
                    active,
                    cmio,
                    snap=snap,
                    file_col="_dml_file",
                )
                .join(_bcast(src.select(key)), key, "left_semi")
            )
            # ONE pass serves both the match totals and the touched-file
            # set (VERDICT r16 item 4: this used to be two jobs over the
            # same scan+semi-join — a global agg, then a distinct file
            # collect).  rollup(_dml_file) yields the per-file rows (the
            # touched set) PLUS the grand-total row (file IS NULL) with
            # the global row count and global distinct-key count — the
            # per-file nk values cannot be summed (a key may span files),
            # which is exactly what the rollup's total row avoids.
            # input_file_name() is never NULL, so the NULL row is
            # unambiguously the total.  Driver result stays bounded by
            # file count + 1.
            for r in (
                scan.rollup("_dml_file")
                .agg(
                    F.count("*").alias("nr"),
                    F.countDistinct(key).alias("nk"),
                )
                .collect()
            ):
                if r._dml_file is None:
                    n_matched = r.nr
                    n_matched_keys = r.nk
                else:
                    p = _scan_file_to_local(r._dml_file)
                    touched.append(resolved[os.path.abspath(p)])
            touched.sort()
        target_cols = [
            f.name
            for f in _read_files(spark, table_path, active, cmio).schema.fields
        ] if active else [f.name for f in src.schema.fields]

        # WHEN MATCHED THEN UPDATE SET *: update each matched target row
        # IN PLACE — N duplicate-key target rows stay N rows, each taking
        # the source values (real Delta's cardinality contract; the old
        # anti-join-then-insert collapsed duplicates — ADVICE r9).  A
        # match flag, not coalesce, so a NULL in the source still
        # overwrites.
        marked = _bcast(
            src.select(
                F.col(key),
                F.lit(1).alias("_dml_m"),
                *[
                    F.col(c).alias(f"_dml_src_{c}")
                    for c in target_cols
                    if c != key and c not in idcols and c not in absent_gen
                ],
                # source partition values ride along so the per-group
                # rewrite can route partition-moving rows (below);
                # GENERATED partition columns always recompute from
                # their expression over the source's data columns
                # (round 14) — the source need not carry them, and a
                # carried value never overrides the expression
                *[
                    (
                        F.expr(gen_map[c]) if c in gen_map else F.col(c)
                    ).alias(f"_dml_s_{c}")
                    for c in part_cols
                ],
            )
        )
        # WHEN MATCHED AND <cond>: target columns by bare name, source
        # columns as src.<col> — translated onto the joined frame's
        # _dml_src_ aliases by a token pass that validates every src.*
        # reference (see _translate_matched_condition).  src.<key> is
        # the target key itself (they are equal on a matched row), which
        # the joined frame carries under the bare name.
        aliased = {
            c for c in target_cols if c != key and c not in idcols and c not in absent_gen
        }
        cond_col = (
            F.expr(
                _translate_matched_condition(
                    matched_condition, key, aliased
                )
            )
            if matched_condition is not None
            else F.lit(True)
        )
        hit = (F.col("_dml_m") == 1) & cond_col

        # WHEN NOT MATCHED BY SOURCE (round 13): applies to target rows
        # whose key has NO source row (left-join _dml_m is null); the
        # optional condition references target columns only.  ONE
        # anti-join scan finds the affected rows and their files — the
        # inherent cost of the clause (absence of a match cannot be
        # pruned), bounded by the condition's selectivity.
        nmbs_cond_col = (
            F.expr(not_matched_by_source_condition)
            if not_matched_by_source_condition is not None
            else F.lit(True)
        )
        nmbs_hit = F.col("_dml_m").isNull() & F.coalesce(
            nmbs_cond_col, F.lit(False)
        )
        nmbs_touched: list[str] = []
        n_nmbs = 0
        if not_matched_by_source is not None:
            for c in not_matched_by_source_set or {}:
                if c == key or c in idcols:
                    raise ValueError(
                        "merge_delta: not_matched_by_source_set cannot "
                        f"assign '{c}' (merge key / identity column)"
                    )
                if c in gencols:
                    raise ValueError(
                        f"merge_delta: cannot assign generated column "
                        f"'{c}' in not_matched_by_source_set — it "
                        "recomputes from its expression (Delta's rule)"
                    )
                for pcol in part_cols:
                    pexpr = gen_map.get(pcol)
                    if pexpr and __import__("re").search(
                        rf"\b{__import__('re').escape(c)}\b", pexpr
                    ):
                        raise ValueError(
                            "merge_delta: not_matched_by_source_set "
                            f"cannot assign '{c}' — partition column "
                            f"'{pcol}' is GENERATED from it and NMBS "
                            "updates never move rows"
                        )
                if c in part_cols:
                    raise ValueError(
                        "merge_delta: not_matched_by_source_set cannot "
                        f"assign partition column '{c}' — NOT MATCHED BY "
                        "SOURCE updates never move rows"
                    )
                if c not in target_cols:
                    raise ValueError(
                        "merge_delta: not_matched_by_source_set assigns "
                        f"unknown column '{c}'"
                    )
            if not_matched_by_source_condition is not None and part_cols:
                _guard_partition_columns(
                    not_matched_by_source_condition, part_cols
                )
            if active:
                nscan = (
                    _read_files(
                        spark,
                        table_path,
                        active,
                        cmio,
                        snap=snap,
                        file_col="_dml_file",
                    )
                    .join(_bcast(src.select(key)), key, "left_anti")
                )
                if not_matched_by_source_condition is not None:
                    nscan = nscan.filter(
                        F.expr(not_matched_by_source_condition)
                    )
                # one pass for both the row count and the file set (the
                # same scan+count fusion as _touched_files)
                for r in nscan.groupBy("_dml_file").count().collect():
                    n_nmbs += int(r["count"])
                    p = _scan_file_to_local(r._dml_file)
                    nmbs_touched.append(resolved[os.path.abspath(p)])
                nmbs_touched.sort()

        part_types: dict[str, Any] = {}
        if part_cols:
            import json as _json

            from pyspark.sql.types import StructType as _StructType

            _full = _StructType.fromJson(_json.loads(snap.schema_json))
            part_types = {c: _full[c].dataType for c in part_cols}

        def _moves(pv: dict) -> "F.Column":
            # a matched row MOVES iff the update clause applies (hit —
            # matched AND condition, ADVICE r12: an unconditional check
            # spuriously flagged rows the clause would never touch) and
            # the source's partition tuple differs from this file
            # group's (values cast exactly as _read_adds reinjects them)
            import operator
            from functools import reduce

            differs = reduce(
                operator.or_,
                [
                    ~F.col(f"_dml_s_{c}").eqNullSafe(
                        F.lit(pv.get(c)).cast(part_types[c])
                    )
                    for c in part_cols
                ],
            )
            return F.coalesce(hit & differs, F.lit(False))

        def update_matched(df: DataFrame, pv=None) -> DataFrame:
            joined = df.join(marked, key, "left")
            # NOT MATCHED BY SOURCE first: disjoint from the matched
            # clauses (a row is matched or it isn't), so composition is
            # order-free — this order just keeps the projections simple
            if not_matched_by_source == "delete":
                joined = joined.filter(~nmbs_hit)
            elif not_matched_by_source == "update":
                # ONE select so every assignment reads the OLD row
                # (Delta's UPDATE SET semantics), replacing assigned
                # columns under their bare names for the matched-clause
                # projection below
                joined = joined.select(
                    *[
                        F.when(
                            nmbs_hit,
                            F.expr(not_matched_by_source_set[c]),
                        )
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in (not_matched_by_source_set or {})
                        else F.col(c)
                        for c in joined.columns
                    ]
                )
            if matched == "delete":
                # WHEN MATCHED [AND cond] THEN DELETE
                return joined.filter(~F.coalesce(hit, F.lit(False))).select(
                    *target_cols
                )
            if matched is None:
                # no matched clause: this file is being rewritten for
                # NOT MATCHED BY SOURCE only — matched rows pass through
                return joined.select(*target_cols)
            if part_cols:
                # partition-moving MERGE (round 13): an updated row whose
                # source partition values differ leaves this group's
                # files entirely — its updated version re-enters through
                # the insert path, landing in its NEW partition
                joined = joined.filter(~_moves(pv or {}))
            return joined.select(
                *[
                    F.col(c)
                    # identity values never update — Delta's rule; the
                    # matched row keeps the value it was allocated
                    if c == key or c in idcols or c in absent_gen
                    else F.when(hit, F.col(f"_dml_src_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in target_cols
                ]
            )

        # rows the matched clause actually affects (condition applied);
        # one bounded job over only the touched files
        n_affected = 0
        if matched is not None and touched and n_matched:
            if matched_condition is None:
                n_affected = n_matched
            else:
                n_affected = (
                    _read_files(spark, table_path, touched, cmio, snap=snap)
                    .join(marked, key, "inner")
                    .filter(F.coalesce(cond_col, F.lit(False)))
                    .count()
                )

        # partition-moving MERGE (round 13; was a fail-loud guard): a
        # matched UPDATE row whose source partition values differ from
        # its target row's moves partitions — COW expresses this as a
        # delete from the old group's rewrite (update_matched filters it
        # out) plus an insert of the UPDATED row into its new partition
        # (unioned into the insert path's hive-layout write below).
        # Only the UPDATE clause can move rows; DELETE and
        # no-matched-clause merges never change partition values.
        mover_rows: "DataFrame | None" = None
        n_moved = 0
        if matched == "update" and part_cols and touched and n_matched:
            import operator
            from functools import reduce

            tgt_full = deltalite._read_adds(
                spark,
                table_path,
                {rel: snap.adds[rel] for rel in touched},
                snap.schema_json,
                part_cols,
            )
            differs = reduce(
                operator.or_,
                [
                    ~F.col(c).eqNullSafe(F.col(f"_dml_s_{c}"))
                    for c in part_cols
                ],
            )
            # inner join = matched; cond_col (the translated WHEN
            # MATCHED AND predicate) gates the clause, so rows it never
            # touches cannot move (ADVICE r12 low)
            moved = tgt_full.join(marked, key, "inner").filter(
                F.coalesce(cond_col, F.lit(False)) & differs
            )
            # the mover's new row: UPDATE SET * semantics — source
            # values for data columns, target's key/identity values,
            # source partition values
            mover_rows = moved.select(
                *[
                    (
                        F.col(c)
                        if c == key or c in idcols or c in absent_gen
                        else F.col(f"_dml_src_{c}")
                    ).alias(c)
                    for c in target_cols
                ],
                *[
                    F.col(f"_dml_s_{c}").alias(c)
                    for c in part_cols
                    # GENERATED partition columns recompute in
                    # _rewrite_commit's insert path (round 14) — and
                    # must be absent here so movers union with the
                    # insert frame, which never carries them
                    if c not in target_cols and c not in gen_map
                ],
            )
            n_moved = mover_rows.count()
            if not n_moved:
                mover_rows = None

        # WHEN NOT MATCHED THEN INSERT *: only source rows whose key is
        # absent from the target append (matched keys live in touched
        # files by construction, so the touched scan is the full match
        # set).  Partitioned inserts keep their partition columns for
        # the hive-layout write in _rewrite_commit.
        insert_cols = [
            c
            for c in target_cols
            if c not in idcols and c not in absent_gen
        ] + [
            # generated partition columns compute in the hive-write
            # path (_rewrite_commit) — never required of the source
            c
            for c in part_cols
            if c not in target_cols and c not in gen_map
        ]
        n_inserted = (n_src - n_matched_keys) if insert else 0
        if not insert:
            inserts = None
        elif touched:
            tgt_keys = _read_files(
                spark, table_path, touched, cmio, snap=snap
            ).select(key)
            inserts = src.select(*insert_cols).join(
                tgt_keys, key, "left_anti"
            )
        else:
            inserts = src.select(*insert_cols)

        # allocate identity values for ONLY the insert branch — same
        # distributed (per-partition offset map) scheme as write_delta;
        # skipped when no row inserts so the schema/mark stays untouched
        new_schema_json = None
        if idcols and inserts is not None and n_inserted > 0:
            from pyspark_anomaly_detection_spark.io.deltalite_identity import (
                allocate_identity,
            )

            inserts, new_schema_json = allocate_identity(
                inserts, snap.schema_json
            )
        elif idcols:
            inserts = None  # zero inserts: nothing to append or allocate

        # the PURE insert set, captured before partition movers union in
        # — movers are UPDATES in the change feed, never inserts
        cdc_inserts = inserts if n_inserted > 0 else None

        # partition movers re-enter through the insert path (AFTER
        # identity allocation — movers keep their allocated values)
        if mover_rows is not None:
            inserts = (
                inserts.unionByName(mover_rows)
                if inserts is not None
                else mover_rows
            )

        # no matched clause (insert-only MERGE): matched rows are
        # untouched, so the matched-key files are NOT rewritten — their
        # only role was bounding the anti-join's key scan.  NOT MATCHED
        # BY SOURCE adds its own touched files regardless.
        rewrite_files = sorted(
            set(touched if matched is not None else []) | set(nmbs_touched)
        )

        # row-level change data (round 14): every clause contributes its
        # exact change rows — matched updates as preimage/postimage
        # pairs (partition movers naturally included: preimage in the
        # old partition, postimage carrying the source's), matched and
        # not-matched-by-source deletes as 'delete', the anti-join
        # inserts as 'insert'.  One extra scan of only the rewrite set.
        cdc_df = None
        if _cdf_enabled(snap):
            from pyspark_anomaly_detection_spark.io.deltalite_generated import (
                generated_columns_of,
            )

            gen_exprs = generated_columns_of(snap.schema_json)
            all_cols = target_cols + [
                c for c in part_cols if c not in target_cols
            ]
            hitf = F.coalesce(hit, F.lit(False))

            def _with_gen(df: DataFrame) -> DataFrame:
                for col, expr in gen_exprs.items():
                    df = df.withColumn(col, F.expr(expr))
                return df

            pieces_cdc: list[DataFrame] = []
            if rewrite_files:
                tgt_all = deltalite._read_adds(
                    spark,
                    table_path,
                    {r: snap.adds[r] for r in rewrite_files},
                    snap.schema_json,
                    part_cols,
                ).join(marked, key, "left")
                if matched == "update":
                    m = tgt_all.filter(hitf)
                    pieces_cdc.append(
                        m.select(*all_cols).withColumn(
                            "_change_type", F.lit("update_preimage")
                        )
                    )
                    post = m.select(
                        *[
                            (
                                F.col(c)
                                if c == key or c in idcols or c in absent_gen
                                else F.col(f"_dml_src_{c}")
                            ).alias(c)
                            for c in target_cols
                        ],
                        *[
                            F.col(f"_dml_s_{c}").alias(c)
                            for c in part_cols
                            if c not in target_cols
                        ],
                    )
                    pieces_cdc.append(
                        _with_gen(post)
                        .select(*all_cols)
                        .withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )
                elif matched == "delete":
                    pieces_cdc.append(
                        tgt_all.filter(hitf)
                        .select(*all_cols)
                        .withColumn("_change_type", F.lit("delete"))
                    )
                if not_matched_by_source == "delete":
                    pieces_cdc.append(
                        tgt_all.filter(nmbs_hit)
                        .select(*all_cols)
                        .withColumn("_change_type", F.lit("delete"))
                    )
                elif not_matched_by_source == "update":
                    npre = tgt_all.filter(nmbs_hit)
                    pieces_cdc.append(
                        npre.select(*all_cols).withColumn(
                            "_change_type", F.lit("update_preimage")
                        )
                    )
                    npost = npre.select(
                        *[
                            F.expr(not_matched_by_source_set[c]).alias(c)
                            if c in (not_matched_by_source_set or {})
                            else F.col(c)
                            for c in all_cols
                        ]
                    )
                    pieces_cdc.append(
                        _with_gen(npost)
                        .select(*all_cols)
                        .withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )
            if cdc_inserts is not None:
                pieces_cdc.append(
                    _with_gen(cdc_inserts)
                    .select(*all_cols)
                    .withColumn("_change_type", F.lit("insert"))
                )
            if pieces_cdc:
                cdc_df = pieces_cdc[0]
                for p in pieces_cdc[1:]:
                    cdc_df = cdc_df.unionByName(p)

        out = _rewrite_commit(
            spark,
            table_path,
            rewrite_files,
            update_matched,
            "MERGE",
            extra_adds_df=inserts,
            snap=snap,
            cmio=cmio,
            new_schema_json=new_schema_json,
            transform_with_pv=True,
            cdc_df=cdc_df,
        )
        out["rows_matched"] = n_matched
        out["rows_inserted"] = n_inserted
        out["rows_moved"] = n_moved
        if matched == "update":
            out["rows_updated"] = n_affected
        elif matched == "delete":
            out["rows_deleted"] = n_affected
        if not_matched_by_source == "delete":
            out["rows_deleted_by_source"] = n_nmbs
        elif not_matched_by_source == "update":
            out["rows_updated_by_source"] = n_nmbs
        return out
    finally:
        src.unpersist()


from pyspark_anomaly_detection_spark.registry import register  # noqa: E402


@register(
    "q220_deltalite_dml_census",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice + CASE WHEN o_orderkey % 5 = 0
                                             THEN 1.0 ELSE 0.0 END
                         AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q220_deltalite_dml_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML lifecycle on a deltalite table: orders lands in
    three append commits, a DELETE removes every 7th order key, an
    UPDATE bumps every 5th key's total price by 1.0 — both as
    copy-on-write rewrites of only the touched files — and the final
    snapshot is censused per priority.  The oracle applies the same
    delete predicate and CASE-expressed update straight to orders with
    exact-decimal aggregation, so a green hash proves the rewrites
    removed exactly the right rows, mutated exactly the right rows, and
    disturbed nothing else."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_dml_")
    table = os.path.join(base, "orders_t")
    try:
        for third in (0, 1, 2):
            write_delta(
                orders.filter(F.col("o_orderkey") % 3 == third),
                table,
                mode="append",
            )
        delete_delta(spark, table, "o_orderkey % 7 = 0")
        update_delta(
            spark,
            table,
            "o_orderkey % 5 = 0",
            {"o_totalprice": "o_totalprice + 1.0"},
        )
        result = (
            read_delta(spark, table)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("o_orderpriority")
        )
        return detach_local(result)  # ≤5 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q233_deltalite_merge_clauses",
    # Final price per key is CLOSED-FORM in the key (see the lifecycle in
    # the docstring): %3==0 rows keep base price +50 only when the
    # conditional update's freshness guard passes (%5==0); even non-%3
    # keys arrive via the insert-only merge at base+1000 and are never
    # "fresher" than that afterwards; odd non-%3 keys arrive via the
    # conditional-update merge's insert branch at base±50; the final
    # conditional DELETE removes exactly the odd %7 keys.
    oracle="""
    WITH f AS (
      SELECT o_orderkey AS k, o_orderpriority AS pr,
        CASE WHEN o_orderkey % 3 = 0 THEN
               o_totalprice + CASE WHEN o_orderkey % 5 = 0
                                   THEN 50.0 ELSE 0.0 END
             WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice + CASE WHEN o_orderkey % 5 = 0
                                      THEN 50.0 ELSE -50.0 END
        END AS price
      FROM orders
      WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 2 = 1)
    )
    SELECT pr AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM f GROUP BY pr ORDER BY pr
    """,
)
def q233_deltalite_merge_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE clause-matrix lifecycle (round 12): orders lands through
    three differently-shaped MERGEs —

    1. table created with the %3==0 keys at base price;
    2. INSERT-ONLY merge (``matched=None``): source = even keys at
       base+1000 — existing %6==0 rows untouched, new even keys append;
    3. CONDITIONAL-UPDATE merge (``src.o_totalprice > o_totalprice``):
       source = ALL keys at base + (50 if %5==0 else −50) — only +50
       sources beat a base-priced row, nothing beats base+1000, and the
       insert branch lands the remaining odd keys;
    4. CONDITIONAL-DELETE merge (``matched='delete'``, ``insert=False``):
       source = %7 keys, condition ``src.o_orderkey % 2 = 1`` — exactly
       the odd %7 keys vanish.

    The census hash-checks the closed-form outcome per priority, proving
    every clause (gated update, gated delete, insert-only, no-insert)
    touched exactly the rows Delta's MERGE semantics dictate."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_merge_")
    table = os.path.join(base, "orders_t")
    try:
        write_delta(orders.filter(F.col("o_orderkey") % 3 == 0), table)
        merge_delta(
            spark,
            table,
            orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1000.0
            ),
            key="o_orderkey",
            matched=None,
        )
        merge_delta(
            spark,
            table,
            orders.withColumn(
                "o_totalprice",
                F.col("o_totalprice")
                + F.when(F.col("o_orderkey") % 5 == 0, 50.0).otherwise(-50.0),
            ),
            key="o_orderkey",
            matched_condition="src.o_totalprice > o_totalprice",
        )
        merge_delta(
            spark,
            table,
            orders.filter(F.col("o_orderkey") % 7 == 0),
            key="o_orderkey",
            matched="delete",
            matched_condition="src.o_orderkey % 2 = 1",
            insert=False,
        )
        result = (
            read_delta(spark, table)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("o_orderpriority")
        )
        return detach_local(result)  # ≤5 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q234_deltalite_merge_sync",
    # After a full snapshot-sync MERGE (update + insert + delete-by-
    # source) the table EQUALS the source BY CONSTRUCTION, so the oracle
    # is simply the source's census: the divergences planted in the
    # target (missing %5==4 keys, +7.0-stale %3==0 prices, %7==0 rows
    # absent from the source) must all have been repaired — a hash
    # match proves every clause fired on exactly the right rows.
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q234_deltalite_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full snapshot-sync MERGE (round 13 — WHEN NOT MATCHED BY SOURCE):
    the target starts divergent from the current snapshot in all three
    ways a replica drifts — stale values (%3==0 prices +7.0), missing
    rows (%5==4 keys never loaded), and rows deleted upstream (%7==0
    keys, absent from the source).  ONE merge with
    ``not_matched_by_source='delete'`` repairs all three: matched rows
    take source values, unmatched source rows insert, target rows gone
    from the source delete.  The census then hash-checks that the table
    EQUALS the source."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_sync_")
    table = os.path.join(base, "orders_t")
    try:
        # the drifted replica
        write_delta(
            orders.filter(F.col("o_orderkey") % 5 != 4).withColumn(
                "o_totalprice",
                F.col("o_totalprice")
                + F.when(F.col("o_orderkey") % 3 == 0, 7.0).otherwise(0.0),
            ),
            table,
        )
        # the current snapshot
        merge_delta(
            spark,
            table,
            orders.filter(F.col("o_orderkey") % 7 != 0),
            key="o_orderkey",
            not_matched_by_source="delete",
        )
        result = (
            read_delta(spark, table)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("o_orderpriority")
        )
        return detach_local(result)  # ≤5 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q239_deltalite_cdf_dml_census",
    # Per-commit, per-change-type census of the ROW-LEVEL feed.  Each
    # leg's row set and prices are closed-form in the key: v2 deletes
    # the %7 keys at base price; v3 updates the live %5 keys (preimage
    # base, postimage base+1); v4's merge matches live %11 keys (their
    # preimage includes v3's +1 when %5 too — proving the feed reflects
    # the table state BETWEEN commits) and re-inserts the %77 keys the
    # delete removed, all at base+100.
    oracle="""
    WITH t AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders)
    SELECT 2 AS commit_version, 'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(p AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM t WHERE k % 7 = 0
    UNION ALL
    SELECT 3, 'update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(CAST(SUM(CAST(p AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
    FROM t WHERE k % 5 = 0 AND k % 7 <> 0
    UNION ALL
    SELECT 3, 'update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(p + 1.0 AS DECIMAL(18,2))) AS DOUBLE)
    FROM t WHERE k % 5 = 0 AND k % 7 <> 0
    UNION ALL
    SELECT 4, 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(p + 100.0 AS DECIMAL(18,2))) AS DOUBLE)
    FROM t WHERE k % 11 = 0 AND k % 7 = 0
    UNION ALL
    SELECT 4, 'update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(p + CASE WHEN k % 5 = 0 THEN 1.0 ELSE 0.0 END
                          AS DECIMAL(18,2))) AS DOUBLE)
    FROM t WHERE k % 11 = 0 AND k % 7 <> 0
    UNION ALL
    SELECT 4, 'update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(p + 100.0 AS DECIMAL(18,2))) AS DOUBLE)
    FROM t WHERE k % 11 = 0 AND k % 7 <> 0
    ORDER BY commit_version, change_type
    """,
)
def q239_deltalite_cdf_dml_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-level change data feed for copy-on-write DML (round 14 —
    verdict r13 item 3): orders lands with
    ``delta.enableChangeDataFeed=true``, a DELETE removes the %7 keys,
    an UPDATE bumps the %5 keys' price by 1.0, and a MERGE upserts the
    %11 keys at base+100 — each rewrite writing spec-shaped
    ``_change_data`` files + ``cdc`` actions.  The feed census proves
    every commit reports EXACTLY its changed rows (preimage/postimage
    pairs for updates, never file-level delete+insert storms) and that
    v4's preimages reflect v3's update — the feed is consistent with
    the table's state between commits."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta_changes,
        set_table_properties,
        write_delta,
    )

    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
    )
    base = tempfile.mkdtemp(prefix="deltalite_cdf_dml_")
    table = os.path.join(base, "orders_t")
    try:
        write_delta(orders, table)
        set_table_properties(
            table, {"delta.enableChangeDataFeed": "true"}
        )
        delete_delta(spark, table, "k % 7 = 0")
        update_delta(spark, table, "k % 5 = 0", {"p": "p + 1.0"})
        merge_delta(
            spark,
            table,
            orders.filter(F.col("k") % 11 == 0).withColumn(
                "p", F.col("p") + 100.0
            ),
            key="k",
        )
        feed = read_delta_changes(spark, table, from_version=1)
        result = (
            feed.groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("p").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("commit_version", "change_type")
        )
        return detach_local(result)  # 6 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
