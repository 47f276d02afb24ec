"""Deletion vectors for deltalite — merge-on-read DELETE.

Copy-on-write DELETE (io/deltalite_dml.py) rewrites every touched file;
at 100 TB a selective delete touching many files pays a full rewrite of
each.  Delta's DELETION VECTORS (protocol reader v3, feature
``deletionVectors``) instead attach a bitmap of deleted ROW INDICES to
the untouched data file: the commit re-adds the same path with a
``deletionVector`` descriptor, writes no data, and readers subtract the
bitmap — deletes become metadata-sized, reads pay one anti-join.

Implementation against the public protocol (PROTOCOL.md "Deletion
Vectors"; bitmap format in io/roaring.py — the portable 64-bit Roaring
serialization):

* descriptors use INLINE storage (``storageType 'i'``, the default):
  the serialized bitmap, Z85-encoded, lives in the log itself.
  ``sizeInBytes`` is the un-encoded byte length (Z85 pads to 4-byte
  groups), ``cardinality`` the deleted-row count.  FILE-BASED storage
  (``'u'``, ``storage='u'``) writes one spec-format DV file per commit
  (1-byte version, then per-DV ``<int32 size><bitmap><int32 CRC-32>``),
  and descriptors carry the z85-encoded uuid + byte offset — the scale
  path that keeps a huge delete's bitmaps out of the JSON log.
  Byte-compat with real Delta is untestable in this sandbox (no jars —
  COVERAGE.md S6); the formats follow the published spec and
  round-trip through this module.
* row indices come from the JVM scan's ``_metadata.row_index`` — the
  parquet row position Delta defines DV indices over.
* the bitmaps build EXECUTOR-side (one ``applyInPandas`` group per
  touched file — driver state stays one descriptor per FILE), and
  decode executor-side the same way for reads.
* re-deleting merges: a file's existing DV ORs into the new one, and
  already-deleted rows never re-count in ``rows_deleted``.

Scale shape: the delete scans once (predicate pushed to the parquet
scan), shuffles matched ``(file, row_index)`` pairs only, and commits
O(touched files) log bytes.  DV-aware reads anti-join against the
decoded positions — broadcast when total cardinality is small (known
from the descriptors without decoding), shuffle otherwise.
"""

from __future__ import annotations

import os
import struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import deltalite
from pyspark_anomaly_detection_spark.io.roaring import (
    deserialize_roaring64,
    serialize_roaring64,
)

#: Broadcast the anti-join side when the descriptors' summed
#: cardinality is below this (the positions frame is ~16 bytes/row).
DV_BROADCAST_MAX_ROWS = 5_000_000

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85 over zero-padded 4-byte groups (the pre-padding
    length travels separately as the descriptor's ``sizeInBytes``)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (val,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[val % 85])
            val //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, size: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        val = 0
        for c in text[i : i + 5]:
            val = val * 85 + _Z85_INDEX[c]
        out += struct.pack(">I", val)
    return bytes(out[:size] if size is not None else out)


def _file_uri(table_path: str, rel: str) -> str:
    """Canonical join key for a data file: the plain absolute path.
    ``_metadata.file_path`` columns are normalized to the same form via
    :func:`_norm_file_path_col` — scheme-independent, so a Spark version
    rendering ``file:/``, ``file://`` or ``file:///`` all match (ADVICE
    r10: joining on a hand-built ``file:`` rendering silently matched
    nothing if the rendering drifted, resurrecting DV-deleted rows)."""
    return os.path.abspath(os.path.join(table_path, rel))


def _norm_file_path_col(col):
    """``_metadata.file_path`` → plain absolute path: strip any
    ``file:``/``file://``/``file:///`` prefix down to a single ``/``,
    then percent-DECODE URI escapes — hive partition directories with
    special characters (``o_orderpriority=4-NOT SPECIFIED`` → ``%20``)
    arrive URI-encoded from the scan but live decoded on disk and in
    the log's add paths (round 13, surfaced by DV × partitions).
    Literal ``+`` is protected first: it is a legal path byte that
    ``url_decode``'s form semantics would turn into a space."""
    stripped = F.regexp_replace(col, r"^file:/*", "/")
    return F.url_decode(F.regexp_replace(stripped, r"\+", "%2B"))


def _dv_file_path(table_path: str, path_or_inline: str) -> str:
    """'u'-storage descriptor → absolute DV file path, per the published
    spec: ``pathOrInlineDv`` is ``<random prefix><z85-encoded uuid>``
    (the final 20 chars encode the 16 uuid bytes; anything before them
    is a directory prefix), naming
    ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    import uuid as _uuid

    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    return os.path.join(
        table_path, *([prefix] if prefix else []), f"deletion_vector_{u}.bin"
    )


def write_dv_file(
    table_path: str, blobs: list[bytes]
) -> list[dict[str, Any]]:
    """Write ONE on-disk deletion-vector file holding all of a commit's
    bitmaps, in the spec's storage format: a 1-byte format version (1),
    then per DV ``<int32 BE size><bitmap bytes><int32 BE CRC-32>``;
    descriptors carry the byte OFFSET of their entry.  Returns one 'u'
    descriptor dict per blob (cardinality left to the caller)."""
    import uuid as _uuid
    import zlib

    dv_uuid = _uuid.uuid4()
    enc = z85_encode(dv_uuid.bytes)  # 16 bytes → exactly 20 chars
    full = os.path.join(table_path, f"deletion_vector_{dv_uuid}.bin")
    descs: list[dict[str, Any]] = []
    with open(full, "wb") as f:
        f.write(b"\x01")
        for blob in blobs:
            offset = f.tell()
            f.write(struct.pack(">i", len(blob)))
            f.write(blob)
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
            descs.append(
                {
                    "storageType": "u",
                    "pathOrInlineDv": enc,
                    "offset": offset,
                    "sizeInBytes": len(blob),
                }
            )
    return descs


def _decode_descriptor(
    dv: dict[str, Any], table_path: "str | None" = None
) -> list[int]:
    """Deleted row indices of a descriptor — inline ('i': Z85 bitmap in
    the log) or file-based ('u': seek into the spec-format DV file,
    CRC-verified).  ``table_path`` is required for 'u'."""
    st = dv.get("storageType")
    if st == "i":
        return deserialize_roaring64(
            z85_decode(dv["pathOrInlineDv"], dv.get("sizeInBytes"))
        )
    if st in ("u", "p"):
        import zlib

        if st == "p":
            # absolute-path storage (spec 'p'): pathOrInlineDv IS the
            # DV file's absolute path — shallow CLONEs of 'u'-DV
            # tables emit these so the clone's descriptors keep
            # resolving against the SOURCE table's DV file (round 13)
            full = dv["pathOrInlineDv"]
        else:
            if table_path is None:
                raise ValueError(
                    "deltalite DV: decoding a 'u' descriptor needs "
                    "table_path"
                )
            full = _dv_file_path(table_path, dv["pathOrInlineDv"])
        with open(full, "rb") as f:
            f.seek(int(dv.get("offset", 1)))
            (size,) = struct.unpack(">i", f.read(4))
            data = f.read(size)
            (crc,) = struct.unpack(">I", f.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(
                f"deltalite DV: checksum mismatch in {full} at offset "
                f"{dv.get('offset')}"
            )
        return deserialize_roaring64(data)
    raise NotImplementedError(
        f"deltalite DV: storageType {st!r} not supported"
    )


def dv_positions_df(
    spark: SparkSession, table_path: str, dv_adds: dict[str, dict[str, Any]]
) -> DataFrame:
    """(_dv_f, _dv_i) deleted positions of every DV-carrying add —
    decoded executor-side (both 'i' and 'u' storage), one Arrow batch
    per file."""
    import json

    rows = [
        (_file_uri(table_path, rel), json.dumps(a["deletionVector"]))
        for rel, a in sorted(dv_adds.items())
    ]
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    src = local_rows_df(spark, rows, "_dv_f string, _desc string")

    def gen(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            for f, desc in zip(pdf["_dv_f"], pdf["_desc"]):
                pos = _decode_descriptor(_json.loads(desc), table_path)
                yield pd.DataFrame({"_dv_f": f, "_dv_i": pos})

    return src.mapInPandas(gen, "_dv_f string, _dv_i long")


def read_files_minus_dv(
    spark: SparkSession,
    table_path: str,
    dv_adds: dict[str, dict[str, Any]],
    schema,
    file_col: "str | None" = None,
) -> DataFrame:
    """Read DV-carrying data files with their deleted rows subtracted
    (anti-join on (file, row_index)).  ``file_col`` keeps the source
    file's NORMALIZED absolute path as a trailing column — the COW DML
    touched-file scan needs it (round 14: DML runs on DV tables by
    reading THROUGH the bitmap)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(
        *[os.path.join(table_path, rel) for rel in sorted(dv_adds)]
    ).select(
        "*",
        _norm_file_path_col(F.col("_metadata.file_path")).alias("_dv_f"),
        F.col("_metadata.row_index").alias("_dv_i"),
    )
    pos = dv_positions_df(spark, table_path, dv_adds)
    total_card = sum(
        int(a["deletionVector"].get("cardinality") or 0)
        for a in dv_adds.values()
    )
    if total_card <= DV_BROADCAST_MAX_ROWS:
        pos = F.broadcast(pos)
    # A key-list join MOVES the join keys to the FRONT of the output
    # ([_dv_f, _dv_i, data...]), so the data-column ORDER must be
    # restored explicitly: column-mapped callers rename this frame
    # POSITIONALLY (deltalite_dml._read_files toDF), and the rotated
    # order bound logical columns to the file-path column — the
    # CM × DV × touched-file-scan composition the r15 schema-feature
    # lifecycle fuzz caught (tests/test_deltalite_model_fuzz.py).
    data_cols = [c for c in df.columns if c not in ("_dv_f", "_dv_i")]
    out = df.join(pos, ["_dv_f", "_dv_i"], "left_anti")
    if file_col:
        return out.select(*data_cols, F.col("_dv_f").alias(file_col))
    return out.select(*data_cols)


def dv_diff_rows(
    spark: SparkSession,
    table_path: str,
    pairs: "list[tuple[str, dict[str, Any], dict[str, Any] | None]]",
    schema,
) -> DataFrame:
    """Rows NEWLY deleted by a DV rewrite commit: for each
    ``(rel_path, new_add, old_dv_descriptor_or_None)`` pair, the data
    file's rows at positions ``decode(new) - decode(old)`` — the
    row-level delta the change feed reports for a merge-on-read DELETE
    (verdict r10 item 3).  Bitmaps decode executor-side; the position
    set is broadcast below the usual DV threshold."""
    import json

    rows = [
        (
            _file_uri(table_path, rel),
            json.dumps(new_add["deletionVector"]),
            json.dumps(old_dv) if old_dv else None,
        )
        for rel, new_add, old_dv in pairs
    ]
    from pyspark_anomaly_detection_spark.io.detach import local_rows_df

    src = local_rows_df(
        spark, rows, "_dv_f string, _new string, _old string"
    )

    def gen(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            for f, n, o in zip(pdf["_dv_f"], pdf["_new"], pdf["_old"]):
                pos = set(_decode_descriptor(_json.loads(n), table_path))
                if isinstance(o, str):
                    pos -= set(
                        _decode_descriptor(_json.loads(o), table_path)
                    )
                yield pd.DataFrame({"_dv_f": f, "_dv_i": sorted(pos)})

    pos = src.mapInPandas(gen, "_dv_f string, _dv_i long")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(
        *[os.path.join(table_path, rel) for rel, _, _ in pairs]
    ).select(
        "*",
        _norm_file_path_col(F.col("_metadata.file_path")).alias("_dv_f"),
        F.col("_metadata.row_index").alias("_dv_i"),
    )
    total_card = sum(
        int(a["deletionVector"].get("cardinality") or 0) for _, a, _ in pairs
    )
    if total_card <= DV_BROADCAST_MAX_ROWS:
        pos = F.broadcast(pos)
    return df.join(pos, ["_dv_f", "_dv_i"], "left_semi").drop(
        "_dv_f", "_dv_i"
    )


def dv_protocol_action(proto: "dict[str, Any] | None") -> dict[str, Any]:
    """Protocol action announcing the deletionVectors table feature
    (reader v3 / writer v7 — the table-features protocol), MERGED with
    the table's existing protocol (round 14): per the spec, a v7
    upgrade must list every feature the prior legacy version implied
    (``_LEGACY_WRITER_FEATURES`` — so a reader-v2 mapped table keeps
    ``columnMapping`` in BOTH feature lists, a writer-v6 identity table
    keeps ``identityColumns``, …), and deltalite stamps in-commit
    timestamps into every commit so ``inCommitTimestamp`` rides along
    (writer-only — it never appears in readerFeatures)."""
    proto = proto or {"minReaderVersion": 1, "minWriterVersion": 2}
    reader_feats = set(proto.get("readerFeatures") or [])
    if proto.get("minReaderVersion", 1) == 2:
        reader_feats.add("columnMapping")  # legacy reader v2 == CM
    reader_feats.add("deletionVectors")
    writer_feats = deltalite._folded_writer_features(proto)
    writer_feats.update({"deletionVectors", "inCommitTimestamp"})
    return {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": sorted(reader_feats),
            "writerFeatures": sorted(writer_feats),
        }
    }


def delete_delta_dv(
    spark: SparkSession,
    table_path: str,
    predicate: str,
    storage: str = "i",
) -> dict[str, int]:
    """Merge-on-read DELETE: attach/extend a deletion vector on every
    file containing live rows matching ``predicate`` — no data files
    are written.  ``storage='i'`` inlines the Z85 bitmap in the log;
    ``storage='u'`` writes ONE spec-format DV file for the commit and
    the descriptors reference it by uuid + offset (the scale path: a
    huge delete's bitmaps stay out of the JSON log).  Returns
    {'version', 'files_with_dv', 'rows_deleted'} where rows_deleted
    counts NEWLY deleted rows only."""
    if storage not in ("i", "u"):
        raise ValueError(f"deltalite DV storage must be 'i'|'u': {storage}")
    snap = deltalite._snapshot_state(table_path)
    if snap.part_cols:
        # partitioned tables are supported (round 13): the scan below
        # reads DATA files (no partition columns in them), bitmaps are
        # per-file regardless of layout, and the rewritten add actions
        # carry the old add's partitionValues — only predicates naming
        # a partition column must refuse (they live in the log)
        from pyspark_anomaly_detection_spark.io.deltalite_dml import (
            _guard_partition_columns,
        )

        _guard_partition_columns(predicate, snap.part_cols)
    adds = snap.adds
    if not adds:
        return {"version": snap.version, "files_with_dv": 0, "rows_deleted": 0}

    # live rows = file rows minus existing DV positions.  Column-mapped
    # tables (r11): read through the PHYSICAL schema and alias back to
    # logical names so the caller's predicate binds — same translation
    # the DML module uses.
    mapping = deltalite._column_mapping_of(snap.schema_json)
    paths = [os.path.join(table_path, rel) for rel in sorted(adds)]
    meta_cols = [
        _norm_file_path_col(F.col("_metadata.file_path")).alias("_dv_f"),
        F.col("_metadata.row_index").alias("_dv_i"),
    ]
    if mapping:
        import json as _json

        from pyspark.sql.types import StructField, StructType

        schema = StructType.fromJson(_json.loads(snap.schema_json))
        # data columns only: partition fields never live in data files
        # (round 14 — CM × partitions)
        data_fields = [
            f for f in schema.fields if f.name not in (snap.part_cols or [])
        ]
        phys_schema = StructType(
            [
                StructField(
                    mapping.get(f.name, f.name), f.dataType, f.nullable
                )
                for f in data_fields
            ]
        )
        scan = spark.read.schema(phys_schema).parquet(*paths).select(
            *[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in data_fields
            ],
            *meta_cols,
        )
    else:
        scan = spark.read.parquet(*paths).select("*", *meta_cols)
    dv_adds = {r: a for r, a in adds.items() if a.get("deletionVector")}
    if dv_adds:
        existing = dv_positions_df(spark, table_path, dv_adds)
        scan = scan.join(F.broadcast(existing), ["_dv_f", "_dv_i"], "left_anti")
    matched = scan.filter(F.expr(predicate)).select("_dv_f", "_dv_i")

    # executor-side bitmap build: one group per touched file; the OLD
    # bitmap (if any) ORs in via a broadcast closure keyed by file URI
    old_by_uri = {
        _file_uri(table_path, rel): a["deletionVector"]
        for rel, a in dv_adds.items()
    }

    def build(pdf):
        import pandas as pd

        uri = pdf["_dv_f"].iloc[0]
        pos = set(int(i) for i in pdf["_dv_i"])
        n_new = len(pos)
        old = old_by_uri.get(uri)
        if old is not None:
            pos.update(_decode_descriptor(old, table_path))
        blob = serialize_roaring64(sorted(pos))
        return pd.DataFrame(
            {
                "_dv_f": [uri],
                "z": [z85_encode(blob)],
                "size": [len(blob)],
                "card": [len(pos)],
                "n_new": [n_new],
            }
        )

    built = (
        matched.groupBy("_dv_f")
        .applyInPandas(
            build, "_dv_f string, z string, size long, card long, n_new long"
        )
        .collect()
    )  # bounded: one row per touched FILE
    if not built:
        return {"version": snap.version, "files_with_dv": 0, "rows_deleted": 0}

    uri_to_rel = {_file_uri(table_path, rel): rel for rel in adds}
    # one-time protocol upgrade, like real Delta: emit the protocol
    # action only when the table isn't DV-enabled yet — re-emitting it
    # on every delete made _commit_with_retry treat a concurrent blind
    # append as a protocol conflict (ADVICE r10)
    dv_enabled = "deletionVectors" in (
        (snap.protocol or {}).get("readerFeatures") or []
    )
    actions: list[dict[str, Any]] = (
        [] if dv_enabled else [dv_protocol_action(snap.protocol)]
    )
    rows_sorted = sorted(built, key=lambda r: r._dv_f)
    if storage == "u":
        descs = write_dv_file(
            table_path,
            [z85_decode(r.z, int(r.size)) for r in rows_sorted],
        )
        for d, r in zip(descs, rows_sorted):
            d["cardinality"] = int(r.card)
    else:
        descs = [
            {
                "storageType": "i",
                "pathOrInlineDv": r.z,
                "sizeInBytes": int(r.size),
                "cardinality": int(r.card),
            }
            for r in rows_sorted
        ]
    for row, desc in zip(rows_sorted, descs):
        rel = uri_to_rel[row._dv_f]
        old_add = adds[rel]
        actions.append({"remove": {"path": rel, "dataChange": True}})
        new_add = {
            "path": rel,
            "partitionValues": old_add.get("partitionValues", {}),
            "size": old_add.get("size", 0),
            "modificationTime": old_add.get("modificationTime", 0),
            "dataChange": True,
            "deletionVector": desc,
        }
        actions.append({"add": new_add})
    actions.append(
        {"commitInfo": {"operation": "DELETE", "engineInfo": "deltalite-dv"}}
    )
    version = deltalite._commit_with_retry(
        table_path, snap.version + 1, actions
    )
    return {
        "version": version,
        "files_with_dv": len(built),
        "rows_deleted": int(sum(r.n_new for r in built)),
    }


def purge_delta(spark: SparkSession, table_path: str) -> dict[str, int]:
    """``REORG TABLE ... APPLY (PURGE)``: materialize the deletion
    vectors — rewrite ONLY the DV-carrying files with their deleted
    rows dropped, commit remove+add with ``dataChange: false`` (the
    LOGICAL content is unchanged, so streams treat the reorg as
    transparently as an OPTIMIZE), and leave the table DV-free, which
    re-enables OPTIMIZE / COW DML / stats / checkpointable-by-content
    operations.  Old files stay on disk for time travel until a
    VACUUM."""
    import uuid as _uuid

    snap = deltalite._snapshot_state(table_path)
    dv_adds = {
        r: a for r, a in snap.adds.items() if a.get("deletionVector")
    }
    if not dv_adds:
        return {
            "version": snap.version,
            "files_purged": 0,
            "files_added": 0,
        }
    import json as _json

    from pyspark.sql.types import StructField, StructType

    schema = (
        StructType.fromJson(_json.loads(snap.schema_json))
        if snap.schema_json
        else None
    )
    # partitioned tables (round 13): data files carry no partition
    # columns, so purge rewrites per partition GROUP with the group's
    # partitionValues re-stamped on the new adds.  Partition fields drop
    # by LOGICAL name BEFORE the physical rename (round 14: the old
    # order filtered physical names against logical part_cols, leaving
    # phantom partition fields in a mapped partitioned purge)
    if snap.part_cols and schema is not None:
        schema = StructType(
            [f for f in schema.fields if f.name not in snap.part_cols]
        )
    # column-mapped tables (r11): purge rewrites files in PHYSICAL space
    # end-to-end — read phys, write phys — no rename round-trip needed
    mapping = deltalite._column_mapping_of(snap.schema_json)
    if mapping and schema is not None:
        schema = StructType(
            [
                StructField(
                    mapping.get(f.name, f.name), f.dataType, f.nullable
                )
                for f in schema.fields
            ]
        )
    groups: dict[tuple, dict[str, Any]] = {}
    for rel, a in dv_adds.items():
        pv = a.get("partitionValues") or {}
        groups.setdefault(tuple(sorted(pv.items())), {})[rel] = a
    version = snap.version + 1
    commit_dir = f"part-{version:05d}-{_uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table_path, commit_dir)
    actions: list[dict[str, Any]] = []
    for rel in sorted(dv_adds):
        actions.append({"remove": {"path": rel, "dataChange": False}})
    n_added = 0

    # Partition groups are INDEPENDENT rewrite jobs writing to disjoint
    # subdirs — run them from a small driver thread pool so the next
    # group's tasks back-fill executors freed by the current group's
    # tail (guide §2.6; r17: a 5-partition purge paid 5 sequential
    # ~1 s jobs of mostly fixed overhead).  Actions are collected per
    # group and extended in group order, so the commit JSON is
    # byte-stable vs the sequential form; any group failure propagates
    # out of pool.map before the commit is attempted.
    def _purge_group(i: int, pv_items, group) -> list[dict[str, Any]]:
        cleaned = read_files_minus_dv(spark, table_path, group, schema)
        subdir = f"g{i}" if snap.part_cols else ""
        out_dir = os.path.join(data_dir, subdir) if subdir else data_dir
        cleaned.write.mode("error").parquet(out_dir)
        adds: list[dict[str, Any]] = []
        for name in sorted(os.listdir(out_dir)):
            if name.endswith(".parquet"):
                rel = (
                    f"{commit_dir}/{subdir}/{name}"
                    if subdir
                    else f"{commit_dir}/{name}"
                )
                adds.append(
                    {
                        "add": {
                            "path": rel,
                            "partitionValues": dict(pv_items),
                            "size": os.path.getsize(
                                os.path.join(out_dir, name)
                            ),
                            "modificationTime": 0,
                            "dataChange": False,
                        }
                    }
                )
        return adds

    ordered = sorted(groups.items())
    if len(ordered) == 1:
        group_adds = [_purge_group(0, *ordered[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(4, len(ordered))
        ) as pool:
            group_adds = list(
                pool.map(
                    lambda t: _purge_group(t[0], *t[1]),
                    enumerate(ordered),
                )
            )
    for adds in group_adds:
        actions.extend(adds)
        n_added += len(adds)
    actions.append(
        {"commitInfo": {"operation": "REORG PURGE",
                        "engineInfo": "deltalite-dv"}}
    )
    version = deltalite._commit_with_retry(table_path, version, actions)
    return {
        "version": version,
        "files_purged": len(dv_adds),
        "files_added": n_added,
    }


from pyspark_anomaly_detection_spark.registry import register  # noqa: E402


@register(
    "q224_deltalite_dv_census",
    # Same detached-Arrow return shape as q213/q220 (JVM-only plan on
    # the returned frame).  The oracle applies the delete predicates
    # directly to orders: a green hash proves the DV bitmaps deleted
    # exactly the right ROW POSITIONS across two merging DV commits,
    # and that the reader's anti-join subtracts them losslessly.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 3
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q224_deltalite_dv_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE lifecycle: orders lands in three append
    commits, TWO successive deletion-vector deletes (every 7th key,
    then every key ≡ 3 mod 11 — the second merges into files that
    already carry DVs) attach bitmaps WITHOUT writing a single data
    file, a REORG PURGE materializes the bitmaps (dataChange=false
    rewrite of only the DV files — round 11, verdict item 7), and the
    final snapshot censuses per priority; the census is identical
    before and after the purge by construction, so the oracle pins
    both the DV-subtracting reader AND the purge's losslessness."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_dv_")
    table = os.path.join(base, "orders_t")
    try:
        for third in (0, 1, 2):
            deltalite.write_delta(
                orders.filter(F.col("o_orderkey") % 3 == third),
                table,
                mode="append",
            )
        delete_delta_dv(spark, table, "o_orderkey % 7 = 0")
        delete_delta_dv(spark, table, "o_orderkey % 11 = 3")
        purge_delta(spark, table)
        result = (
            deltalite.read_delta(spark, table)
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
    "q227_deltalite_dv_cdf_census",
    # Detached-Arrow return shape like q224 (JVM-only plan on the
    # returned frame).  The oracle derives each DV commit's row-level
    # delete set straight from orders: commit 2 deletes every 7th key
    # (inline 'i' bitmaps), commit 3 deletes keys ≡ 3 mod 11 that
    # commit 2 didn't already delete (file-based 'u' bitmaps — the
    # merge means already-deleted keys must NOT reappear in the feed).
    # A green hash proves the change feed expresses deletion-vector
    # rewrites as exact row-level deltas for BOTH storage types.
    oracle="""
    SELECT 2 AS commit_version, 'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT 3, 'delete',
           CAST(COUNT(*) AS BIGINT),
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
    FROM orders WHERE o_orderkey % 11 = 3 AND o_orderkey % 7 <> 0
    ORDER BY commit_version
    """,
)
def q227_deltalite_dv_cdf_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-level change feed across merge-on-read deletes (verdict r10
    item 3): orders lands in two appends, a DV delete with INLINE
    bitmaps removes every 7th key, a second DV delete with FILE-BASED
    ('u') bitmaps removes keys ≡ 3 mod 11 (merging into files that
    already carry DVs), and the batch CDF over the two DV commits is
    censused per commit — each commit must report exactly its NEWLY
    deleted rows, never a file-level delete+insert pair."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_dv_cdf_")
    table = os.path.join(base, "orders_t")
    try:
        for half in (0, 1):
            deltalite.write_delta(
                orders.filter(F.col("o_orderkey") % 2 == half),
                table,
                mode="append",
            )
        delete_delta_dv(spark, table, "o_orderkey % 7 = 0", storage="i")
        delete_delta_dv(spark, table, "o_orderkey % 11 = 3", storage="u")
        feed = deltalite.read_delta_changes(spark, table, from_version=1)
        result = (
            feed.groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("commit_version")
        )
        return detach_local(result)  # 2 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q236_deltalite_dv_partitioned",
    # q224's lifecycle on a PARTITIONED table (round 13 — DV x
    # partitions was a fail-loud guard): bitmaps attach per data file
    # inside hive partitions, the reader subtracts per partition group
    # and reinjects partition values, a partition-pruned read agrees
    # with SQL's WHERE on the partition column, and REORG PURGE
    # re-stamps each rewritten file's partitionValues.  The census
    # GROUPs BY the partition column itself, so a NULL-partition bug
    # (the failure mode the old guard prevented) collapses every group
    # and can't hash-match.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 3
          AND o_orderpriority >= '3'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q236_deltalite_dv_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deletion vectors on a PARTITIONED deltalite table: orders lands
    hive-partitioned by o_orderpriority, two successive DV deletes
    attach bitmaps (the second merges into already-DV'd files; no data
    files written), a REORG PURGE materializes them preserving each
    file's partitionValues, and the census reads back through a
    PARTITION-PRUNED read (priorities ≥ '3' — the pruning happens in
    the log, the oracle's WHERE replays it)."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_dv_part_")
    table = os.path.join(base, "orders_t")
    try:
        deltalite.write_delta(
            orders, table, partition_by=["o_orderpriority"]
        )
        delete_delta_dv(spark, table, "o_orderkey % 7 = 0")
        delete_delta_dv(spark, table, "o_orderkey % 11 = 3", storage="u")
        purge_delta(spark, table)
        pruned = deltalite.read_delta(spark, table).filter(
            F.col("o_orderpriority") >= "3"
        )
        result = (
            pruned.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .orderBy("o_orderpriority")
        )
        return detach_local(result)  # ≤3 rows; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q237_deltalite_dv_dml_census",
    # Closed form per key (lifecycle in the docstring): %11 keys end at
    # base+100 whether they were live (matched UPDATE) or DV-deleted
    # (re-INSERT through the not-matched branch); other live keys keep
    # base plus the +1.0 COW-update bump when %5==0; %7 keys not
    # resurrected by the merge stay deleted.
    oracle="""
    WITH f AS (
      SELECT o_orderpriority AS pr,
        CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 100.0
             ELSE o_totalprice + CASE WHEN o_orderkey % 5 = 0
                                      THEN 1.0 ELSE 0.0 END
        END AS price
      FROM orders
      WHERE o_orderkey % 7 <> 0 OR o_orderkey % 11 = 0
    )
    SELECT pr AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM f GROUP BY pr ORDER BY pr
    """,
)
def q237_deltalite_dv_dml_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deletion-vector × DML lifecycle (round 14 — verdict r13 item 1):
    orders lands in three appends, a merge-on-read DELETE bitmaps every
    7th key, a copy-on-write UPDATE bumps every live 5th key's price by
    1.0 — the rewrite reads touched files THROUGH their bitmaps and
    drops those files' DVs in the same commit — and a MERGE upserts
    every 11th key at base+100: live ones match and update, DV-deleted
    ones (%77 keys) are NOT matched and re-insert.  The census
    hash-checks the closed form, proving deletes never resurrect
    through rewrites, bitmap subtraction composes with the merge's
    matched/not-matched split, and untouched files keep their DVs."""
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite_dml import (
        merge_delta,
        update_delta,
    )
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="deltalite_dv_dml_")
    table = os.path.join(base, "orders_t")
    try:
        for third in (0, 1, 2):
            deltalite.write_delta(
                orders.filter(F.col("o_orderkey") % 3 == third),
                table,
                mode="append",
            )
        delete_delta_dv(spark, table, "o_orderkey % 7 = 0")
        update_delta(
            spark,
            table,
            "o_orderkey % 5 = 0",
            {"o_totalprice": "o_totalprice + 1.0"},
        )
        merge_delta(
            spark,
            table,
            orders.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") + 100.0
            ),
            key="o_orderkey",
        )
        result = (
            deltalite.read_delta(spark, table)
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
