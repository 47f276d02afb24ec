"""Model-based randomized lifecycle fuzz for the deltalite DML matrix
(round 14).

Every unit test pins ONE composition; this drives a seeded-random
SEQUENCE of operations — append, copy-on-write DELETE/UPDATE,
merge-on-read (DV) delete with both storage types, MERGE (upsert and
NMBS snapshot-sync), OPTIMIZE, REORG PURGE — against a trivial
in-memory model (a dict), asserting full-state equality after every
step and time-travel equality against recorded model snapshots at the
end.  Partitioned and change-data-feed variants run the same walk, so
the DV × CDF × partition × compaction interleavings that no
hand-written test enumerates get exercised: 3 walks × 12 ops ≈ a few
hundred distinct composition edges per run, deterministic per seed."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from pyspark_anomaly_detection_spark.io.deltalite import (
    _snapshot_state,
    optimize_delta,
    read_delta,
    set_table_properties,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dv import (
    delete_delta_dv,
    purge_delta,
)

OPS = (
    "append",
    "delete",
    "update",
    "dv_delete",
    "merge",
    "merge_sync",
    "optimize",
    "purge",
)


def _df(spark, rows, partitioned):
    if partitioned:
        data = [(k, v, str(k % 2)) for k, v in rows]
        return spark.createDataFrame(data, "id long, v long, side string")
    return spark.createDataFrame(list(rows), "id long, v long")


def _read_state(spark, t, partitioned):
    out = {}
    for r in read_delta(spark, t).collect():
        out[r.id] = r.v
        if partitioned:
            assert r.side == str(r.id % 2), (
                f"partition value drifted for id {r.id}: {r.side}"
            )
    return out


@pytest.mark.parametrize(
    "seed,partitioned,cdf",
    [(7, False, False), (23, True, False), (91, False, True)],
)
def test_dml_lifecycle_matches_model(spark, tmp_path, seed, partitioned, cdf):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    next_id = 0
    model: dict[int, int] = {}

    def fresh(n):
        nonlocal next_id
        rows = [(i, i * 3 + seed) for i in range(next_id, next_id + n)]
        next_id += n
        return rows

    rows = fresh(rng.randint(20, 40))
    model.update(dict(rows))
    write_delta(
        _df(spark, rows, partitioned),
        t,
        partition_by=["side"] if partitioned else None,
    )
    if cdf:
        set_table_properties(t, {"delta.enableChangeDataFeed": "true"})

    snapshots = [(_snapshot_state(t).version, dict(model))]
    trace = []
    for step in range(12):
        op = rng.choice(OPS)
        trace.append(op)
        if op == "append":
            rows = fresh(rng.randint(5, 15))
            model.update(dict(rows))
            write_delta(_df(spark, rows, partitioned), t, mode="append")
        elif op == "delete":
            m = rng.randint(2, 7)
            r = rng.randint(0, m - 1)
            delete_delta(spark, t, f"id % {m} = {r}")
            model = {k: v for k, v in model.items() if k % m != r}
        elif op == "update":
            m = rng.randint(2, 7)
            r = rng.randint(0, m - 1)
            c = rng.randint(1, 99)
            update_delta(spark, t, f"id % {m} = {r}", {"v": f"v + {c}"})
            model = {
                k: (v + c if k % m == r else v) for k, v in model.items()
            }
        elif op == "dv_delete":
            m = rng.randint(3, 9)
            r = rng.randint(0, m - 1)
            storage = rng.choice(["i", "u"])
            delete_delta_dv(spark, t, f"id % {m} = {r}", storage=storage)
            model = {k: v for k, v in model.items() if k % m != r}
        elif op == "merge":
            upd = (
                rng.sample(sorted(model), rng.randint(0, min(5, len(model))))
                if model
                else []
            )
            new = fresh(rng.randint(0, 5))
            src = [(k, model[k] + 1000) for k in upd] + new
            if not src:
                continue
            merge_delta(spark, t, _df(spark, src, partitioned), key="id")
            model.update(dict(src))
        elif op == "merge_sync":
            if len(model) < 4:
                continue
            keep = rng.sample(sorted(model), len(model) * 3 // 4)
            src = [(k, model[k]) for k in keep]
            merge_delta(
                spark,
                t,
                _df(spark, src, partitioned),
                key="id",
                not_matched_by_source="delete",
            )
            model = {k: model[k] for k in keep}
        elif op == "optimize":
            optimize_delta(spark, t)
        elif op == "purge":
            purge_delta(spark, t)
        got = _read_state(spark, t, partitioned)
        assert got == model, (
            f"seed {seed} step {step} after {op} (trace {trace}): "
            f"extra={sorted(set(got) - set(model))[:5]} "
            f"missing={sorted(set(model) - set(got))[:5]} "
            f"drifted={[k for k in got if k in model and got[k] != model[k]][:5]}"
        )
        snapshots.append((_snapshot_state(t).version, dict(model)))

    # time travel must reproduce the model at sampled points of history
    for version, snap in rng.sample(snapshots, min(4, len(snapshots))):
        got = {
            r.id: r.v for r in read_delta(spark, t, version=version).collect()
        }
        assert got == snap, f"seed {seed}: time travel to v{version} drifted"


# ---------------------------------------------------------------------------
# Schema-feature walks (VERDICT r15 item 3): the same randomized lifecycle
# on column-mapped, generated-column, and identity tables — the r14 one-off
# bugs (OPTIMIZE nulling partitionValues, MERGE KeyError on clones) were
# interleaving bugs that only a walk finds, and none of the three walks
# above touches a schema-feature table.
# ---------------------------------------------------------------------------

from pyspark_anomaly_detection_spark.io.deltalite_cm import (  # noqa: E402
    rename_column_mapped,
    write_delta_mapped,
)

#: generated expression under test: derived from the UPDATABLE column, so
#: every UPDATE/MERGE must recompute it through the rewrite
GEN_EXPR = "v * 2 + 1"
#: partition-stable generated expression (id never changes, so DML never
#: moves rows across generated partitions)
GEN_PART_EXPR = "id % 3"


@pytest.mark.parametrize(
    "seed,variant",
    [
        (101, "cm"),
        (139, "cm_part"),
        (173, "generated"),
        (227, "generated_part"),
        (281, "identity"),
    ],
)
def test_dml_lifecycle_schema_features(spark, tmp_path, seed, variant):
    rng = random.Random(seed)
    t = str(tmp_path / f"t{seed}")
    cm = variant.startswith("cm")
    partitioned = variant == "cm_part"
    gen = variant.startswith("generated")
    gen_part = variant == "generated_part"
    identity = variant == "identity"
    gen_expr = GEN_PART_EXPR if gen_part else GEN_EXPR

    next_id = 0
    model: dict[int, int] = {}
    vname = "v"  # current logical name of the value column (cm renames it)
    sk_seen: dict[int, int] = {}  # identity: id → allocated surrogate key
    sk_high = 0  # identity: global high-water mark observed so far

    def fresh(n):
        nonlocal next_id
        rows = [(i, i * 3 + seed) for i in range(next_id, next_id + n)]
        next_id += n
        return rows

    def make_df(rows):
        if partitioned:
            data = [(k, v, str(k % 2)) for k, v in rows]
            return spark.createDataFrame(
                data, f"id long, {vname} long, side string"
            )
        return spark.createDataFrame(list(rows), f"id long, {vname} long")

    def write(rows, mode="append"):
        df = make_df(rows)
        if cm:
            write_delta_mapped(
                df, t, mode=mode,
                partition_by=["side"] if (partitioned and mode != "append") else None,
            )
        else:
            write_delta(df, t, mode=mode)

    def read_state():
        """id → v under the CURRENT logical name, with variant invariants
        asserted row-by-row."""
        nonlocal sk_high
        out = {}
        rows = read_delta(spark, t).collect()
        new_sks = []
        for r in rows:
            v = r[vname]
            out[r.id] = v
            if partitioned:
                assert r.side == str(r.id % 2), (
                    f"partition value drifted for id {r.id}: {r.side}"
                )
            if gen:
                want = (r.id % 3) if gen_part else (v * 2 + 1)
                assert r.g == want, (
                    f"generated column stale for id {r.id}: g={r.g}, "
                    f"expected {want} (v={v})"
                )
            if identity:
                if r.id in sk_seen:
                    assert r.sk == sk_seen[r.id], (
                        f"identity value drifted for id {r.id}: "
                        f"{r.sk} != {sk_seen[r.id]}"
                    )
                else:
                    new_sks.append((r.id, r.sk))
        if identity:
            # freshly inserted rows allocate ABOVE the committed
            # high-water mark: strictly greater than every sk seen before
            for rid, sk in new_sks:
                assert sk > sk_high or not sk_seen, (
                    f"identity allocation below high-water mark: id {rid} "
                    f"got {sk}, mark was {sk_high}"
                )
                assert sk % 2 == 1, f"identity step drifted: {sk}"
                sk_seen[rid] = sk
            live_sks = [sk_seen[k] for k in out]
            assert len(set(live_sks)) == len(live_sks), "identity collision"
            sk_high = max(sk_high, *live_sks) if live_sks else sk_high
        return out

    # creation commit with the variant's schema feature
    rows = fresh(rng.randint(20, 40))
    model.update(dict(rows))
    if cm:
        write_delta_mapped(
            make_df(rows), t, partition_by=["side"] if partitioned else None
        )
    elif gen:
        write_delta(
            make_df(rows), t,
            generated_columns={"g": gen_expr},
            partition_by=["g"] if gen_part else None,
        )
    else:
        write_delta(
            make_df(rows), t,
            identity_columns={"sk": {"start": 1, "step": 2}},
        )
    assert read_state() == model

    ops = list(OPS) + (["rename"] * 2 if cm else [])
    snapshots = [(_snapshot_state(t).version, dict(model), vname)]
    trace = []
    for step in range(12):
        op = rng.choice(ops)
        trace.append(op)
        if op == "append":
            rows = fresh(rng.randint(5, 15))
            model.update(dict(rows))
            write(rows, mode="append")
        elif op == "delete":
            m = rng.randint(2, 7)
            r = rng.randint(0, m - 1)
            delete_delta(spark, t, f"id % {m} = {r}")
            model = {k: v for k, v in model.items() if k % m != r}
        elif op == "update":
            m = rng.randint(2, 7)
            r = rng.randint(0, m - 1)
            c = rng.randint(1, 99)
            update_delta(
                spark, t, f"id % {m} = {r}", {vname: f"{vname} + {c}"}
            )
            model = {
                k: (v + c if k % m == r else v) for k, v in model.items()
            }
        elif op == "dv_delete":
            m = rng.randint(3, 9)
            r = rng.randint(0, m - 1)
            storage = rng.choice(["i", "u"])
            delete_delta_dv(spark, t, f"id % {m} = {r}", storage=storage)
            model = {k: v for k, v in model.items() if k % m != r}
        elif op == "merge":
            upd = (
                rng.sample(sorted(model), rng.randint(0, min(5, len(model))))
                if model
                else []
            )
            new = fresh(rng.randint(0, 5))
            src = [(k, model[k] + 1000) for k in upd] + new
            if not src:
                continue
            merge_delta(spark, t, make_df(src), key="id")
            model.update(dict(src))
        elif op == "merge_sync":
            if len(model) < 4:
                continue
            keep = rng.sample(sorted(model), len(model) * 3 // 4)
            src = [(k, model[k]) for k in keep]
            merge_delta(
                spark, t, make_df(src), key="id",
                not_matched_by_source="delete",
            )
            model = {k: model[k] for k in keep}
        elif op == "optimize":
            optimize_delta(spark, t)
        elif op == "purge":
            purge_delta(spark, t)
        elif op == "rename":
            nxt = "w" if vname == "v" else "v"
            rename_column_mapped(t, vname, nxt)
            vname = nxt
        got = read_state()
        assert got == model, (
            f"variant {variant} seed {seed} step {step} after {op} "
            f"(trace {trace}): "
            f"extra={sorted(set(got) - set(model))[:5]} "
            f"missing={sorted(set(model) - set(got))[:5]} "
            f"drifted={[k for k in got if k in model and got[k] != model[k]][:5]}"
        )
        snapshots.append((_snapshot_state(t).version, dict(model), vname))

    # time travel reproduces the model at sampled history points — under
    # the LOGICAL name current at that version (cm renames are metadata
    # commits, so historical snapshots expose the historical name)
    for version, snap, name_then in rng.sample(
        snapshots, min(4, len(snapshots))
    ):
        got = {
            r.id: r[name_then]
            for r in read_delta(spark, t, version=version).collect()
        }
        assert got == snap, (
            f"variant {variant} seed {seed}: time travel to v{version} drifted"
        )
