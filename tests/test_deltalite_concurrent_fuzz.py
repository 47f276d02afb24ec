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


# ---------------------------------------------------------------------------
# N≥3 writers × maintenance ops × concurrent readers (VERDICT r15 item 4)
# ---------------------------------------------------------------------------


def _maintenance(spark, t, seed, outcomes, stop, barrier):
    """Maintenance loop racing the writers: OPTIMIZE, checkpoint, and an
    age-guarded VACUUM (Delta's deletedFileRetentionDuration contract —
    a 0-horizon sweep may eat a concurrent writer's just-staged file,
    so concurrent VACUUM runs with a horizon longer than any op, and
    actual reclamation is asserted quiescently after the join)."""
    import time

    from pyspark_anomaly_detection_spark.io.deltalite import (
        create_checkpoint,
        vacuum_delta,
    )

    rng = random.Random(seed)
    barrier.wait()
    while not stop.is_set():
        op = rng.choice(("optimize", "checkpoint", "vacuum"))
        try:
            if op == "optimize":
                optimize_delta(spark, t)
            elif op == "checkpoint":
                create_checkpoint(t)
            else:
                vacuum_delta(t, retain_versions=3, min_file_age_seconds=600)
            outcomes.append(("ok", op))
        except DeltaliteConcurrentCommit:
            outcomes.append(("conflict", op))
        time.sleep(rng.uniform(0.0, 0.1))


def _reader(spark, t, n_reads, results, barrier):
    """Concurrent snapshot reader: every read must come back clean —
    torn state surfaces post-join as a state matching NO commit."""
    barrier.wait()
    for _ in range(n_reads):
        results.append({r.id: r.v for r in read_delta(spark, t).collect()})


def _model_states(init, journal):
    """state-after-version map by replaying journaled effects in commit
    order — the serialization order under optimistic concurrency."""
    states = {0: dict(init)}
    model = dict(init)
    for v, kind, payload in sorted(journal, key=lambda e: e[0]):
        if kind == "upsert":
            model.update(payload)
        elif kind == "insert_only":
            for k, val in payload.items():
                model.setdefault(k, val)
        elif kind == "delete_mod":
            m, r = payload
            model = {k: val for k, val in model.items() if k % m != r}
        elif kind == "update_mod":
            m, r, c = payload
            model = {
                k: (val + c if k % m == r else val)
                for k, val in model.items()
            }
        states[v] = dict(model)
    return states


@pytest.mark.parametrize("seed", [7, 59])
def test_concurrent_three_writer_maintenance_reader_fuzz(
    spark, tmp_path, seed
):
    """Seeded 3-writer DML fuzz with a racing maintenance thread
    (OPTIMIZE / checkpoint / age-guarded VACUUM) and a racing snapshot
    reader.  Invariants:

    * every writer op commits cleanly or raises
      DeltaliteConcurrentCommit — never a silent lost update,
    * committed versions are unique and the final state equals the
      version-order replay of journaled effects,
    * the reader NEVER sees torn state: every concurrent read equals
      the replayed state of some committed version (snapshot isolation
      across OPTIMIZE's remove+add commits included),
    * quiescent maintenance afterwards (checkpoint → expire_log →
      0-horizon VACUUM) preserves the final state, reclaims storage,
      and keeps time travel working for every surviving log version.
    """
    import threading as th

    from pyspark_anomaly_detection_spark.io.deltalite import (
        create_checkpoint,
        expire_log,
        vacuum_delta,
    )

    t = str(tmp_path / f"c3t{seed}")
    init = [(i, i) for i in range(100)]
    write_delta(_df(spark, init), t)

    journal: list = []
    outcomes: list = []
    maint_outcomes: list = []
    reads: list = []
    stop = th.Event()
    n_writers = 3
    barrier = th.Barrier(n_writers + 2)
    writers = [
        th.Thread(
            target=_writer,
            args=(spark, t, seed * 101 + k, 1000 * (k + 1), journal,
                  outcomes, barrier),
        )
        for k in range(n_writers)
    ]
    maint = th.Thread(
        target=_maintenance,
        args=(spark, t, seed * 7, maint_outcomes, stop, barrier),
    )
    reader = th.Thread(target=_reader, args=(spark, t, 12, reads, barrier))
    for thread in (*writers, maint, reader):
        thread.start()
    for w in writers:
        w.join(timeout=900)
        assert not w.is_alive(), "writer thread hung"
    stop.set()
    maint.join(timeout=300)
    reader.join(timeout=300)
    assert not maint.is_alive() and not reader.is_alive()

    assert len(outcomes) == n_writers * 8, outcomes
    assert maint_outcomes, "maintenance thread never ran an op"

    versions = [v for v, _, _ in journal]
    assert len(versions) == len(set(versions)), sorted(versions)

    states = _model_states(init, journal)
    final = states[max(states)]
    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got == final, f"seed {seed}: final state diverges from replay"

    # reader-never-sees-torn-state: every concurrent read IS some
    # committed version's state
    state_index = {
        tuple(sorted(s.items())): v for v, s in states.items()
    }
    assert len(reads) == 12
    for i, r in enumerate(reads):
        key = tuple(sorted(r.items()))
        assert key in state_index, (
            f"seed {seed}: read {i} matches NO committed version "
            f"({len(r)} rows) — torn snapshot"
        )

    # quiescent maintenance: checkpoint → expire, then time travel must
    # still work for journaled versions at/after the horizon
    create_checkpoint(t)
    expire_log(t)
    surviving = _list_versions(t)
    for v in sorted(set(surviving) & set(states))[-3:]:
        tt = {
            r.id: r.v for r in read_delta(spark, t, version=v).collect()
        }
        assert tt == states[v], f"time travel at v{v} diverges"
    # 0-horizon reclaim sweeps pre-OPTIMIZE files; the latest snapshot
    # is untouched
    res = vacuum_delta(t, retain_versions=1, min_file_age_seconds=0.0)
    assert res["files_kept"] >= 1
    got2 = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got2 == final, "state changed across quiescent maintenance"
