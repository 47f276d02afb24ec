"""Randomized two-writer interleaving fuzz for deltalite's optimistic
concurrency (VERDICT r15 item 4).

The deterministic two-threaded blind-append test (tests/test_deltalite.py)
proves appends rebase; the cdc-action conflict unit tests pin single
edges.  This drives SEEDED RANDOM sequences of the full DML op set —
append, COW delete/update, DV delete, MERGE upsert, MERGE sync, OPTIMIZE
— from two concurrent threads against one table and asserts the protocol
invariant the conflict matrix exists to guarantee:

  every operation either (a) commits cleanly, and the FINAL table state
  equals replaying the successful operations' effects in COMMIT-VERSION
  order against a dict model (version order IS the serialization order
  under optimistic concurrency), or (b) raises
  ``DeltaliteConcurrentCommit`` — never a silent lost update, partial
  commit, or resurrected file.

Replay journaling: each thread records (committed version, effect) for
every op that actually committed — DML ops that matched nothing return
the PRIOR snapshot version without committing and are excluded via their
rows_* counters.  OPTIMIZE is state-preserving so it needs no journal
entry (it may also legitimately conflict).  Thread id-spaces are
disjoint so both threads can insert concurrently without manufacturing
duplicate-key ambiguity the file-level conflict matrix does not claim to
resolve.
"""

from __future__ import annotations

import random
import threading

import pytest

from pyspark_anomaly_detection_spark.io.deltalite import (
    DeltaliteConcurrentCommit,
    _list_versions,
    optimize_delta,
    read_delta,
    write_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)
from pyspark_anomaly_detection_spark.io.deltalite_dv import delete_delta_dv

OPS = ("append", "delete", "update", "dv_delete", "merge", "merge_sync",
       "optimize")


def _df(spark, rows):
    return spark.createDataFrame(list(rows), "id long, v long")


def _writer(spark, t, seed, id_base, journal, outcomes, barrier):
    """One writer thread: 8 seeded ops, journaling committed effects."""
    rng = random.Random(seed)
    next_id = id_base
    own_ids: list[int] = []  # ids THIS thread introduced (disjoint spaces)

    def fresh(n):
        nonlocal next_id
        rows = [(i, i * 7 + seed) for i in range(next_id, next_id + n)]
        next_id += n
        own_ids.extend(i for i, _ in rows)
        return rows

    barrier.wait()
    for _ in range(8):
        op = rng.choice(OPS)
        try:
            if op == "append":
                rows = fresh(rng.randint(3, 8))
                v = write_delta(_df(spark, rows), t, mode="append")
                journal.append((v, "upsert", dict(rows)))
            elif op == "delete":
                m = rng.randint(2, 7)
                r = rng.randint(0, m - 1)
                res = delete_delta(spark, t, f"id % {m} = {r}")
                if res["rows_deleted"] > 0:
                    journal.append((res["version"], "delete_mod", (m, r)))
            elif op == "dv_delete":
                m = rng.randint(3, 9)
                r = rng.randint(0, m - 1)
                res = delete_delta_dv(
                    spark, t, f"id % {m} = {r}", storage=rng.choice(["i", "u"])
                )
                if res["rows_deleted"] > 0:
                    journal.append((res["version"], "delete_mod", (m, r)))
            elif op == "update":
                m = rng.randint(2, 7)
                r = rng.randint(0, m - 1)
                c = rng.randint(1, 99)
                res = update_delta(spark, t, f"id % {m} = {r}", {"v": f"v + {c}"})
                if res["rows_updated"] > 0:
                    journal.append((res["version"], "update_mod", (m, r, c)))
            elif op == "merge":
                # source: updates of OWN ids (matched branch — rewrites
                # files shared with the other thread's rows, the
                # interleaving-rich path) + >=1 fresh insert, which
                # guarantees the merge is a real commit either way.
                # MERGE is an upsert whatever happened to the matched
                # ids meanwhile: matched rows update to the source
                # value, missing ones insert it — so the journal effect
                # is model.update(src) in both cases.
                upd = (
                    rng.sample(own_ids, min(len(own_ids), rng.randint(1, 4)))
                    if own_ids
                    else []
                )
                src = [(k, rng.randint(0, 10**6)) for k in upd] + fresh(
                    rng.randint(1, 3)
                )
                res = merge_delta(spark, t, _df(spark, src), key="id")
                journal.append((res["version"], "upsert", dict(src)))
            elif op == "merge_sync":
                # NMBS sync restricted to THIS thread's id space via the
                # merge key join: express as matched-update + fresh insert
                src = fresh(rng.randint(1, 3))
                res = merge_delta(
                    spark, t, _df(spark, src), key="id", matched=None
                )
                journal.append((res["version"], "insert_only", dict(src)))
            elif op == "optimize":
                optimize_delta(spark, t)
            outcomes.append(("ok", op))
        except DeltaliteConcurrentCommit:
            outcomes.append(("conflict", op))


@pytest.mark.parametrize("seed", [11, 43, 97])
def test_concurrent_two_writer_dml_fuzz(spark, tmp_path, seed):
    t = str(tmp_path / f"ct{seed}")
    init = [(i, i) for i in range(100)]
    write_delta(_df(spark, init), t)

    journal: list = []  # thread-safe: list.append is atomic under the GIL
    outcomes: list = []
    barrier = threading.Barrier(2)
    threads = [
        threading.Thread(
            target=_writer,
            args=(spark, t, seed * 31 + k, 1000 * (k + 1), journal,
                  outcomes, barrier),
        )
        for k in (0, 1)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
        assert not th.is_alive(), "writer thread hung"

    # every op resolved: clean commit, clean no-op, or a raised conflict
    assert len(outcomes) == 16, outcomes
    n_conflicts = sum(1 for s, _ in outcomes if s == "conflict")

    # committed versions are unique and within the actual log
    versions = [v for v, _, _ in journal]
    assert len(versions) == len(set(versions)), (
        f"two effects claim one version: {sorted(versions)}"
    )
    log_versions = set(_list_versions(t))
    assert set(versions) <= log_versions

    # serializable replay: apply journaled effects in version order
    model = dict(init)
    for _, kind, payload in sorted(journal, key=lambda e: e[0]):
        if kind == "upsert":
            model.update(payload)
        elif kind == "insert_only":
            for k, v in payload.items():
                model.setdefault(k, v)
        elif kind == "delete_mod":
            m, r = payload
            model = {k: v for k, v in model.items() if k % m != r}
        elif kind == "update_mod":
            m, r, c = payload
            model = {
                k: (v + c if k % m == r else v) for k, v in model.items()
            }

    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got == model, (
        f"seed {seed}: state diverges from version-order replay "
        f"({n_conflicts} conflicts raised): "
        f"extra={sorted(set(got) - set(model))[:5]} "
        f"missing={sorted(set(model) - set(got))[:5]} "
        f"drifted={[k for k in got if k in model and got[k] != model[k]][:5]}"
    )
