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

* descriptors use INLINE storage (``storageType 'i'``): the serialized
  bitmap, Z85-encoded, lives in the log itself.  ``sizeInBytes`` is the
  un-encoded byte length (Z85 pads to 4-byte groups), ``cardinality``
  the deleted-row count.  File-based storage ('u') is a mechanical
  extension and raises for now.  Byte-compat with real Delta is
  untestable in this sandbox (no jars — COVERAGE.md S6); the format
  follows the published spec and round-trips through this module.
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
    ``file:``/``file://``/``file:///`` prefix down to a single ``/``."""
    return F.regexp_replace(col, r"^file:/*", "/")


def _decode_descriptor(dv: dict[str, Any]) -> list[int]:
    if dv.get("storageType") != "i":
        raise NotImplementedError(
            f"deltalite DV: storageType {dv.get('storageType')!r} not "
            "supported (inline only)"
        )
    return deserialize_roaring64(
        z85_decode(dv["pathOrInlineDv"], dv.get("sizeInBytes"))
    )


def dv_positions_df(
    spark: SparkSession, table_path: str, dv_adds: dict[str, dict[str, Any]]
) -> DataFrame:
    """(_dv_f, _dv_i) deleted positions of every DV-carrying add —
    decoded executor-side, one Arrow batch per file."""
    import pandas as pd  # noqa: F401

    rows = [
        (
            _file_uri(table_path, rel),
            a["deletionVector"]["pathOrInlineDv"],
            int(a["deletionVector"].get("sizeInBytes") or 0) or None,
        )
        for rel, a in sorted(dv_adds.items())
    ]
    src = spark.createDataFrame(rows, "_dv_f string, _z string, _sz long")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for f, z, sz in zip(pdf["_dv_f"], pdf["_z"], pdf["_sz"]):
                size = int(sz) if sz is not None and not pd.isna(sz) else None
                pos = deserialize_roaring64(z85_decode(z, size))
                yield pd.DataFrame({"_dv_f": f, "_dv_i": pos})

    return src.mapInPandas(gen, "_dv_f string, _dv_i long")


def read_files_minus_dv(
    spark: SparkSession,
    table_path: str,
    dv_adds: dict[str, dict[str, Any]],
    schema,
) -> DataFrame:
    """Read DV-carrying data files with their deleted rows subtracted
    (anti-join on (file, row_index))."""
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
    return df.join(pos, ["_dv_f", "_dv_i"], "left_anti").drop(
        "_dv_f", "_dv_i"
    )


#: Protocol action announcing the deletionVectors table feature
#: (reader v3 / writer v7 — the table-features protocol).
DV_PROTOCOL_ACTION = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


def delete_delta_dv(
    spark: SparkSession, table_path: str, predicate: str
) -> dict[str, int]:
    """Merge-on-read DELETE: attach/extend a deletion vector on every
    file containing live rows matching ``predicate`` — no data files
    are written.  Returns {'version', 'files_with_dv', 'rows_deleted'}
    where rows_deleted counts NEWLY deleted rows only."""
    snap = deltalite._snapshot_state(table_path)
    deltalite._guard_no_cm(snap.schema_json, "DV delete")
    if snap.part_cols:
        raise NotImplementedError(
            "deltalite DV delete on partitioned tables is not supported"
        )
    adds = snap.adds
    if not adds:
        return {"version": snap.version, "files_with_dv": 0, "rows_deleted": 0}

    # live rows = file rows minus existing DV positions
    scan = (
        spark.read.parquet(
            *[os.path.join(table_path, rel) for rel in sorted(adds)]
        )
        .select(
            "*",
            _norm_file_path_col(F.col("_metadata.file_path")).alias("_dv_f"),
            F.col("_metadata.row_index").alias("_dv_i"),
        )
    )
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
            pos.update(_decode_descriptor(old))
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
        [] if dv_enabled else [DV_PROTOCOL_ACTION]
    )
    for row in sorted(built, key=lambda r: r._dv_f):
        rel = uri_to_rel[row._dv_f]
        old_add = adds[rel]
        actions.append({"remove": {"path": rel, "dataChange": True}})
        new_add = {
            "path": rel,
            "partitionValues": old_add.get("partitionValues", {}),
            "size": old_add.get("size", 0),
            "modificationTime": old_add.get("modificationTime", 0),
            "dataChange": True,
            "deletionVector": {
                "storageType": "i",
                "pathOrInlineDv": row.z,
                "sizeInBytes": int(row.size),
                "cardinality": int(row.card),
            },
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
    deltalite._guard_no_cm(snap.schema_json, "PURGE")
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

    from pyspark.sql.types import StructType

    schema = (
        StructType.fromJson(_json.loads(snap.schema_json))
        if snap.schema_json
        else None
    )
    cleaned = read_files_minus_dv(spark, table_path, dv_adds, schema)
    version = snap.version + 1
    commit_dir = f"part-{version:05d}-{_uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table_path, commit_dir)
    cleaned.write.mode("error").parquet(data_dir)
    actions: list[dict[str, Any]] = []
    for rel in sorted(dv_adds):
        actions.append({"remove": {"path": rel, "dataChange": False}})
    n_added = 0
    for name in sorted(os.listdir(data_dir)):
        if name.endswith(".parquet"):
            actions.append(
                {
                    "add": {
                        "path": f"{commit_dir}/{name}",
                        "partitionValues": {},
                        "size": os.path.getsize(
                            os.path.join(data_dir, name)
                        ),
                        "modificationTime": 0,
                        "dataChange": False,
                    }
                }
            )
            n_added += 1
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
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
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
    file, and the final snapshot censuses per priority through the
    DV-subtracting reader."""
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
