"""Tracked persist() pool — fixes the round-3 cache-leak class.

Several operators persist an intermediate frame that feeds two or more
downstream legs of the SAME query plan (shingle frames for LSH joins,
dedup edge lists, set-join per-doc frames).  The persist is correct —
the frame is computed once per action instead of per leg — but the
operator returns a LAZY plan, so it cannot unpersist before the caller's
action without losing the sharing.  Round 3 therefore leaked one cache
entry per invocation: bench sweeps and repeated test/driver runs
accumulated cached partitions until LRU churn.

The fix is lifetime management at the query-runner level (per ADVICE):

* operators call :func:`tracked_persist` instead of ``DataFrame.persist``
* every registry invocation (``registry.register`` wraps each query fn)
  first calls :func:`release_tracked`, dropping the PREVIOUS query's
  caches — so at most one query's working set is ever cached
* bench.py releases after each timed materialization, and the test
  suite releases after every test via an autouse fixture

A released frame's plan still contains its InMemoryRelation node; if the
same returned DataFrame is re-collected later it recomputes through it —
correct, just uncached, which is the right trade for a bounded pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + enrol in the pool released at the next query start."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            # session already stopped — nothing to release
            pass
    return n
