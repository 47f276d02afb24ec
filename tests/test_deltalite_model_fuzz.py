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
