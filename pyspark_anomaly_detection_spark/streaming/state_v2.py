"""Arbitrary stateful processing v2: ``transformWithStateInPandas``
(Spark 4's StatefulProcessor API — typed state variables instead of a
single opaque tuple, per-key timers, TTL support).

Operator: per-user running top-K event values.  Keeps a bounded ListState
(the K largest values seen so far) per user — the streaming form of a
per-key top-k that never holds more than K doubles of state per user,
versus the unbounded collect-and-sort.  Emits each user's current top-K
after every batch the user appears in.

Why v2 over ``applyInPandasWithState``: named state variables
(``getListState``) are individually evolvable and TTL-able, and timers
allow emit-on-silence patterns; the operator below sticks to the portable
core so it runs on any Spark ≥ 4.0.

ENVIRONMENT NOTE: Spark's transformWithStateInPandas driver worker
requires ``google.protobuf``, which is not installed in this container
(verified: the state-schema pre-init worker crashes with ImportError).
``STATE_V2_AVAILABLE`` gates usage; the production stateful operators for
this environment are in ``streaming.stateful`` (applyInPandasWithState,
fully tested).  On a cluster with protobuf present this module runs
unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:  # the TWS driver worker imports protobuf before running any user code
    from google.protobuf import descriptor  # noqa: F401

    STATE_V2_AVAILABLE = True
except ImportError:
    STATE_V2_AVAILABLE = False

TOP_K = 3
OUTPUT_SCHEMA = "user_id long, topk array<double>, n_seen long"


class TopKProcessor(StatefulProcessor):
    """Bounded per-key top-k: state = sorted list of ≤ K values + count."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._topk = handle.getListState("topk", "value double")
        self._seen = handle.getValueState("seen", "n long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        current = [float(r.value) for r in self._topk.get()]
        n = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            n += len(pdf)
            current.extend(float(v) for v in pdf["value"])
            current = sorted(current, reverse=True)[:TOP_K]
        self._topk.clear()
        self._topk.appendList([(v,) for v in current])
        self._seen.update((n,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "topk": [current], "n_seen": [n]}
        )

    def close(self) -> None:
        pass


def stateful_user_topk(events: DataFrame) -> DataFrame:
    """Per-user running top-K values via the StatefulProcessor API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopKProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
