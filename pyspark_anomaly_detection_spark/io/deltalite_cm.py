"""Column mapping ('name' mode) for deltalite — protocol reader v2.

Delta's column mapping decouples LOGICAL column names from the PHYSICAL
names stored in parquet files (PROTOCOL.md "Column Mapping"): each
schema field carries ``delta.columnMapping.physicalName`` (and a stable
``delta.columnMapping.id``) in its metadata, data files use the
physical names, and readers translate back.  This is what makes RENAME
COLUMN a metadata-only operation and shields tables from engines'
name-normalization quirks.

deltalite implements the 'name' mode subset:

* :func:`write_delta_mapped` creates a mapped table (physical names are
  deterministic ``col-<md5(logical)[:8]>`` — content-addressed instead
  of real Delta's uuids so tests and oracles are reproducible; the
  protocol allows any unique physical name) and appends to one by
  translating logical → physical before the write;
* ``read_delta`` (via ``_read_adds``) detects the mapping in the
  committed schema's field metadata and renames physical → logical
  after the scan — time travel included;
* :func:`rename_column_mapped` — the showcase metadata-only rename: a
  new metaData action rebinds a logical name to the SAME physical name;
  zero data files touched, old versions still read under the old name;
* operations whose file-level machinery assumes logical names in the
  data files (COW DML, OPTIMIZE, stats backfill, file-level CDF,
  checkpoints, the streaming source, partitioned layouts, DV deletes)
  fail loud on mapped tables via ``_guard_no_cm`` until taught the
  translation.

Protocol: commit 0 writes ``minReaderVersion 2 / minWriterVersion 5``
(column mapping is exactly the reader-v2 feature set) and the
``delta.columnMapping.mode=name`` table configuration.
"""

from __future__ import annotations

import hashlib
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from pyspark_anomaly_detection_spark.io import deltalite


def physical_name(logical: str) -> str:
    return "col-" + hashlib.md5(logical.encode()).hexdigest()[:8]


def _mapped_schema_json(df: DataFrame) -> str:
    import json

    fields = []
    for i, f in enumerate(df.schema.fields):
        fd = {
            "name": f.name,
            "type": json.loads(f.dataType.json())
            if f.dataType.typeName() in ("struct", "array", "map")
            else f.dataType.typeName(),
            "nullable": f.nullable,
            "metadata": {
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": physical_name(f.name),
            },
        }
        fields.append(fd)
    return json.dumps({"type": "struct", "fields": fields})


def write_delta_mapped(
    df: DataFrame, table_path: str, mode: str = "append"
) -> int:
    """Create or append to a column-mapped deltalite table.  The frame
    carries LOGICAL names; data files land with physical names."""
    import json

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite: {mode}")
    versions = deltalite._list_versions(table_path)
    version = (versions[-1] + 1) if versions else 0
    actions: list[dict[str, Any]] = []
    if version == 0:
        schema_json = _mapped_schema_json(df)
        actions.append(
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
        )
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": str(
                            len(df.schema.fields)
                        ),
                    },
                    "createdTime": 0,
                }
            }
        )
        mapping = {f.name: physical_name(f.name) for f in df.schema.fields}
    else:
        snap = deltalite._snapshot_state(table_path)
        committed = json.loads(snap.schema_json)["fields"]
        mapping = {
            f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
            for f in committed
        }
        if [f.name for f in df.schema.fields] != [
            f["name"] for f in committed
        ]:
            raise ValueError(
                "write_delta_mapped: frame schema must match the committed "
                "logical schema exactly (mergeSchema on mapped tables is "
                "not supported)"
            )
        if mode == "overwrite":
            for path in sorted(snap.adds):
                actions.append(
                    {"remove": {"path": path, "dataChange": True}}
                )

    commit_dir = f"part-{version:05d}-{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table_path, commit_dir)
    df.toDF(*[mapping[f.name] for f in df.schema.fields]).write.mode(
        "error"
    ).parquet(data_dir)
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
                        "dataChange": True,
                    }
                }
            )
    actions.append(
        {
            "commitInfo": {
                "operation": "WRITE" if mode == "append" else "OVERWRITE",
                "engineInfo": "deltalite-cm",
            }
        }
    )
    os.makedirs(os.path.join(table_path, deltalite._LOG_DIR), exist_ok=True)
    return deltalite._commit_with_retry(table_path, version, actions)


def rename_column_mapped(
    table_path: str, old: str, new: str
) -> int:
    """RENAME COLUMN as metadata-only commit: rebind ``old``'s logical
    name to ``new`` keeping the SAME physical name and column id —
    zero data files touched; time travel before the rename still reads
    the old name."""
    import json

    snap = deltalite._snapshot_state(table_path)
    if snap.meta is None or (
        snap.meta.get("configuration", {}).get("delta.columnMapping.mode")
        != "name"
    ):
        raise ValueError(
            "rename_column_mapped requires a column-mapped table"
        )
    schema = json.loads(snap.schema_json)
    names = [f["name"] for f in schema["fields"]]
    if old not in names:
        raise ValueError(f"no such column: {old}")
    if new in names:
        raise ValueError(f"column already exists: {new}")
    for f in schema["fields"]:
        if f["name"] == old:
            f["name"] = new
    meta = dict(snap.meta)
    meta["schemaString"] = json.dumps(schema)
    actions = [
        {"metaData": meta},
        {
            "commitInfo": {
                "operation": "RENAME COLUMN",
                "engineInfo": "deltalite-cm",
            }
        },
    ]
    return deltalite._commit_with_retry(
        table_path, snap.version + 1, actions
    )
