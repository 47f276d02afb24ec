"""Identity columns for deltalite tables (Delta's ``GENERATED ALWAYS AS
IDENTITY``).

The column's start/step and the HIGH-WATER MARK live in the field
metadata of the schemaString (``delta.identity.start`` / ``.step`` /
``.highWaterMark`` — delta-spark's keys), so every commit that writes
rows also commits an updated metaData action bumping the mark: readers
of any version see a consistent upper bound, values are never reused
(an overwrite keeps climbing, like Delta), and two concurrent writers
conflict on the metadata action and retry/abort rather than both
minting the same ids.

Allocation is DISTRIBUTED and collect-bounded: one pass decomposes
``monotonically_increasing_id()`` into (partition, local-offset), a
count-per-partition job collects ONE LONG PER PARTITION, and the
cumulative sums become a broadcast literal map — no global sort, no
single-task window, no driver-side row data.  The same two-job shape as
``text/shards.global_row_ids`` (the q168 operator), which is the 100 TB
form of ROW_NUMBER.

Values are unique and strictly climbing across commits; like Delta,
they are NOT guaranteed contiguous or assignment-ordered within a
commit (partition layout decides), and explicit inserts are rejected
(``allowExplicitInsert`` false — GENERATED ALWAYS).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: field-metadata keys, byte-compatible with delta-spark
IDENTITY_START = "delta.identity.start"
IDENTITY_STEP = "delta.identity.step"
IDENTITY_HWM = "delta.identity.highWaterMark"
IDENTITY_EXPLICIT = "delta.identity.allowExplicitInsert"


def identity_columns_of(schema_json: "str | None") -> dict[str, dict[str, int]]:
    """``{column: {start, step, high_water_mark}}`` from a committed
    schemaString (high_water_mark absent until the first allocation)."""
    if not schema_json:
        return {}
    out: dict[str, dict[str, int]] = {}
    for field in json.loads(schema_json).get("fields", []):
        md = field.get("metadata") or {}
        if IDENTITY_START in md:
            info = {
                "start": int(md[IDENTITY_START]),
                "step": int(md[IDENTITY_STEP]),
            }
            if IDENTITY_HWM in md:
                info["high_water_mark"] = int(md[IDENTITY_HWM])
            out[field["name"]] = info
    return out


def embed_identity_schema(
    base_schema_json: str, identity: dict[str, dict[str, int]]
) -> str:
    """schemaString for the CREATION commit: ``base_schema_json`` (which
    may already carry generation-expression metadata) with the identity
    columns appended as BIGINT fields carrying start/step metadata."""
    schema = json.loads(base_schema_json)
    present = {f["name"] for f in schema["fields"]}
    for col, spec in identity.items():
        if col in present:
            raise ValueError(
                f"deltalite: identity column '{col}' is GENERATED ALWAYS — "
                "it cannot be provided by the writer (allowExplicitInsert "
                "is false)"
            )
        schema["fields"].append(
            {
                "name": col,
                "type": "long",
                "nullable": False,
                "metadata": {
                    IDENTITY_START: int(spec.get("start", 1)),
                    IDENTITY_STEP: int(spec.get("step", 1)),
                    IDENTITY_EXPLICIT: False,
                },
            }
        )
    return json.dumps(schema)


def allocate_identity(
    df: DataFrame, schema_json: str
) -> tuple[DataFrame, "str | None"]:
    """Assign values to every committed identity column missing from
    ``df`` and return (df, new schemaString with bumped high-water
    marks) — or (df, None) when the table has no identity columns.
    Raises if ``df`` provides an identity column explicitly."""
    identity = identity_columns_of(schema_json)
    if not identity:
        return df, None
    for col in identity:
        if col in df.columns:
            raise ValueError(
                f"deltalite: identity column '{col}' is GENERATED ALWAYS — "
                "it cannot be provided by the writer (allowExplicitInsert "
                "is false)"
            )

    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    part = tracked_persist(df)
    mid = F.monotonically_increasing_id()
    pid = F.shiftrightunsigned(F.col("_mid"), 33)
    local = F.col("_mid").bitwiseAND((1 << 33) - 1)
    with_mid = part.withColumn("_mid", mid)
    counts = sorted(
        (r._pid, r["count"])
        for r in with_mid.groupBy(pid.alias("_pid")).count().collect()
    )
    offsets: dict[int, int] = {}
    total = 0
    for p, c in counts:
        offsets[p] = total
        total += c
    # zero-row append: argless F.create_map() is VOID-typed and fails
    # analysis on the lookup — a typed null map typechecks (the ordinal
    # is never evaluated over zero rows; the HWM stays unmoved)
    offset_map = F.create_map(
        *[F.lit(x) for pc in offsets.items() for x in pc]
    ) if offsets else F.lit(None).cast("map<bigint,bigint>")

    schema = json.loads(schema_json)
    out = with_mid
    for col, spec in identity.items():
        step = spec["step"]
        base = spec.get(
            "high_water_mark", spec["start"] - step
        )  # first allocation starts at `start`
        ordinal = offset_map[pid] + local  # 0-based within the commit
        out = out.withColumn(
            col, (F.lit(base) + (ordinal + 1) * F.lit(step)).cast("long")
        )
        new_hwm = base + total * step
        for field in schema["fields"]:
            if field["name"] == col:
                md = dict(field.get("metadata") or {})
                md[IDENTITY_HWM] = new_hwm
                field["metadata"] = md
    return out.drop("_mid"), json.dumps(schema)


from pyspark.sql import SparkSession  # noqa: E402

from pyspark_anomaly_detection_spark.registry import register  # noqa: E402


@register(
    "q230_deltalite_identity_columns",
    # identity VALUES are partition-layout-dependent per commit, but the
    # allocator assigns contiguous ordinals (cumulative per-partition
    # offsets have no gaps), so across the whole lifecycle the value SET
    # is exactly {start + k*step : k in [0, n)} — min, max, distinct
    # count, and sum are all closed-form in COUNT(*), which is what the
    # oracle checks.  Uniqueness-across-commits is the identity
    # contract; a duplicated or skipped allocation breaks the sum.
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN doc_id % 3 <> 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS nm
               FROM documents)
    SELECT n AS n_rows,
           CAST(CASE WHEN n = 0 THEN NULL ELSE 1000 END
                AS BIGINT) AS min_id,
           CAST(CASE WHEN n = 0 THEN NULL ELSE 1000 + 2 * (n - 1) END
                AS BIGINT) AS max_id,
           n AS distinct_ids,
           CAST(CASE WHEN n = 0 THEN NULL
                ELSE n * 1000 + 2 * (n * (n - 1) // 2) END
                AS BIGINT) AS id_sum,
           nm AS n_merged
    FROM c
    """,
)
def q230_deltalite_identity_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Identity-column lifecycle census: documents lands in THREE
    commits on a table created with ``row_sk GENERATED ALWAYS AS
    IDENTITY (START 1000 STEP 2)`` — commit 0 creates with the %3==0
    third, commit 1 appends the %3==1 third, and commit 2 is a MERGE
    whose source is both remaining thirds with source='merged': the
    %3==1 rows hit the UPDATE branch (identity preserved), the %3==2
    rows hit the INSERT branch (identity allocated above the committed
    high-water mark in the same commit).  The final id set must still be
    exactly {1000, 1002, ..., 1000+2(n-1)} — min/max/distinct/sum
    hash-checked cross-engine against closed forms in COUNT(*), plus the
    merged-row census proving the UPDATE branch actually rewrote."""
    import os
    import shutil
    import tempfile

    from pyspark_anomaly_detection_spark.io.deltalite import (
        read_delta,
        write_delta,
    )
    from pyspark_anomaly_detection_spark.io.detach import detach_local
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="deltalite_identity_")
    table = os.path.join(base, "docs_t")
    try:
        write_delta(
            docs.filter(F.col("doc_id") % 3 == 0),
            table,
            identity_columns={"row_sk": {"start": 1000, "step": 2}},
        )
        write_delta(
            docs.filter(F.col("doc_id") % 3 == 1), table, mode="append"
        )
        from pyspark_anomaly_detection_spark.io.deltalite_dml import (
            merge_delta,
        )

        merge_delta(
            spark,
            table,
            docs.filter(F.col("doc_id") % 3 != 0).withColumn(
                "source", F.lit("merged")
            ),
            key="doc_id",
        )
        result = read_delta(spark, table).agg(
            F.count("*").alias("n_rows"),
            F.min("row_sk").alias("min_id"),
            F.max("row_sk").alias("max_id"),
            F.countDistinct("row_sk").alias("distinct_ids"),
            F.sum("row_sk").alias("id_sum"),
            F.sum(
                (F.col("source") == "merged").cast("long")
            ).alias("n_merged"),
        )
        return detach_local(result)  # 1 row; detach before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
