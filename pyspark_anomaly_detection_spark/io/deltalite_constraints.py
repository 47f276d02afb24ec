"""CHECK constraints for deltalite tables (Delta's ``ALTER TABLE ...
ADD CONSTRAINT ... CHECK``).

A constraint is a Spark SQL predicate stored in the table metadata's
``configuration`` under ``delta.constraints.<name>`` — exactly where
delta-spark keeps it — and upgrades the protocol to ``minWriterVersion
3`` (the version that introduced check constraints), so a real Delta
writer that does not understand constraints refuses the table instead
of silently violating it.  Enforcement is write-side, like Delta's
``CheckDeltaInvariant``: every row of every new or rewritten file must
evaluate the predicate to TRUE — a FALSE **or NULL** result is a
violation (fail-closed; a constraint you cannot prove is a constraint
you broke), and the whole commit aborts with a
:class:`DeltaliteConstraintViolation` carrying per-constraint violation
counts.  Readers are unaffected; existing data is validated once at
``ADD CONSTRAINT`` time (Delta scans the table for the same reason).

Scale shape: enforcement is ONE aggregate over the rows being written
(conditional sums, map-side combinable, whole-stage codegen) — never a
second scan of the table; at 100 TB the cost is a few counters per
task on data that is already in memory on its way to Parquet.

Constraints may reference DATA columns only: partition values live in
the log, not the files, so a predicate over a partition column cannot
be evaluated on the rewrite path — rejected at ADD time with a clear
error rather than failing deep inside a later DML.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io import deltalite
from pyspark_anomaly_detection_spark.io.deltalite import _snapshot_state
from pyspark_anomaly_detection_spark.registry import register

#: configuration-key prefix, byte-compatible with delta-spark
CONSTRAINT_PREFIX = "delta.constraints."


class DeltaliteConstraintViolation(Exception):
    """A write/DML would commit rows violating CHECK constraints."""


def check_constraints_of(meta: "dict[str, Any] | None") -> dict[str, str]:
    """``{name: sql_predicate}`` from a metaData action's configuration."""
    conf = (meta or {}).get("configuration") or {}
    return {
        k[len(CONSTRAINT_PREFIX):]: v
        for k, v in conf.items()
        if k.startswith(CONSTRAINT_PREFIX)
    }


def enforce_check_constraints(
    df: DataFrame, constraints: dict[str, str], what: str
) -> None:
    """One aggregate pass over ``df``: per-constraint violation counts
    (predicate not TRUE — NULL counts as a violation, fail-closed).
    Raises :class:`DeltaliteConstraintViolation` naming every violated
    constraint; no-op for an empty constraint map."""
    if not constraints:
        return
    names = sorted(constraints)
    row = df.agg(
        *[
            F.sum(
                F.when(F.expr(constraints[n]).eqNullSafe(F.lit(True)), 0)
                .otherwise(1)
            ).alias(f"_viol_{i}")
            for i, n in enumerate(names)
        ]
    ).first()
    violated = {
        n: int(row[f"_viol_{i}"] or 0)
        for i, n in enumerate(names)
        if (row[f"_viol_{i}"] or 0) > 0
    }
    if violated:
        detail = ", ".join(
            f"{n} CHECK ({constraints[n]}): {c} row(s)"
            for n, c in sorted(violated.items())
        )
        raise DeltaliteConstraintViolation(
            f"deltalite {what}: CHECK constraint(s) violated — {detail}"
        )


def add_check_constraint(
    spark: SparkSession, table_path: str, name: str, expr: str
) -> int:
    """ADD CONSTRAINT ``name`` CHECK (``expr``): validates existing rows
    (one scan), stores the predicate in the metadata configuration, and
    upgrades the protocol to writer v3.  Returns the commit version."""
    snap = _snapshot_state(table_path)
    # column-mapped tables are supported (round 13): the predicate is
    # stored and evaluated in LOGICAL names — every enforcement site
    # reads staged files through the physical→logical translation
    # (write_delta_mapped enforces on the logical input frame;
    # _rewrite_commit translates the staged rewrite before the check),
    # and rename_column_mapped refuses to rename a referenced column.
    key = CONSTRAINT_PREFIX + name
    conf = dict((snap.meta or {}).get("configuration") or {})
    if key in conf:
        raise ValueError(
            f"deltalite: constraint {name!r} already exists on {table_path}"
        )
    # data-columns-only rule: resolve the predicate against the FILE
    # schema (no partition columns) so DML rewrites can evaluate it
    from pyspark.sql.types import StructType

    data_schema = StructType.fromJson(
        __import__("json").loads(snap.schema_json)
    )
    data_only = [f for f in data_schema.fields if f.name not in snap.part_cols]
    try:
        spark.createDataFrame([], StructType(data_only)).select(
            F.expr(expr)
        ).schema
    except Exception as exc:  # unresolved column / bad SQL
        raise ValueError(
            f"deltalite: CHECK predicate {expr!r} must be a valid SQL "
            f"boolean over the data columns "
            f"{[f.name for f in data_only]} (partition columns live in "
            f"the log, not the files): {exc}"
        ) from None

    from pyspark_anomaly_detection_spark.io.deltalite import read_delta

    existing = read_delta(spark, table_path)
    enforce_check_constraints(
        existing, {name: expr}, f"ADD CONSTRAINT {name}"
    )

    conf[key] = expr
    meta = dict(snap.meta)
    meta["configuration"] = conf
    actions: list[dict[str, Any]] = []
    proto = snap.protocol or {}
    writer_v = proto.get("minWriterVersion", 2)
    if writer_v >= 7:
        # table-features protocol (round 14): list checkConstraints in
        # writerFeatures rather than touching the legacy version
        feats = set(proto.get("writerFeatures") or [])
        if "checkConstraints" not in feats:
            actions.append(
                {
                    "protocol": {
                        **proto,
                        "writerFeatures": sorted(
                            feats | {"checkConstraints"}
                        ),
                    }
                }
            )
    elif writer_v < 3:
        reader_v = proto.get("minReaderVersion", 1)
        actions.append(
            {"protocol": {**proto,
                          "minReaderVersion": reader_v,
                          "minWriterVersion": 3}}
        )
    actions.append({"metaData": meta})
    actions.append(
        {
            "commitInfo": {
                "operation": "ADD CONSTRAINT",
                "operationParameters": {"name": name, "expr": expr},
                "engineInfo": "deltalite",
            }
        }
    )
    return deltalite._commit_with_retry(table_path, snap.version + 1, actions)


def drop_check_constraint(
    spark: SparkSession, table_path: str, name: str
) -> int:
    """DROP CONSTRAINT ``name``; returns the commit version."""
    snap = _snapshot_state(table_path)
    key = CONSTRAINT_PREFIX + name
    conf = dict((snap.meta or {}).get("configuration") or {})
    if key not in conf:
        raise ValueError(
            f"deltalite: no constraint {name!r} on {table_path}"
        )
    del conf[key]
    meta = dict(snap.meta)
    meta["configuration"] = conf
    actions = [
        {"metaData": meta},
        {
            "commitInfo": {
                "operation": "DROP CONSTRAINT",
                "operationParameters": {"name": name},
                "engineInfo": "deltalite",
            }
        },
    ]
    return deltalite._commit_with_retry(table_path, snap.version + 1, actions)


@register(
    "q232_deltalite_check_constraints",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q232_deltalite_check_constraints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK-constraint lifecycle census: half of orders lands at v0,
    ADD CONSTRAINT validates it and pins ``o_totalprice >= 0`` (v1), an
    append of the other half with NEGATED prices is rejected atomically
    (no partial commit — the census would drift if any row leaked),
    then the same rows append cleanly with their real prices (v2).  The
    final snapshot must census exactly like the full orders table,
    which the oracle recomputes directly — a green hash proves the
    constraint blocked the bad batch completely and admitted the good
    one untouched."""
    import os
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
    base = tempfile.mkdtemp(prefix="deltalite_constraints_")
    table = os.path.join(base, "orders_t")
    try:
        write_delta(orders.filter(F.col("o_orderkey") % 2 == 0), table)
        add_check_constraint(spark, table, "price_nonneg", "o_totalprice >= 0")
        odd = orders.filter(F.col("o_orderkey") % 2 == 1)
        try:
            write_delta(
                odd.withColumn("o_totalprice", -F.col("o_totalprice") - 1),
                table,
                mode="append",
            )
            raise AssertionError("negative-price append must be rejected")
        except DeltaliteConstraintViolation:
            pass
        write_delta(odd, table, mode="append")
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
