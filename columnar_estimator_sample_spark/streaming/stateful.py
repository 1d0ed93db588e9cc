"""Custom stateful streaming operators (applyInPandasWithState).

Where windows/watermarks can't express the semantics — running per-key
accumulators, custom eviction, cross-batch counters — Structured
Streaming's arbitrary-state API is the engine's extension point
(SURVEY.md §2.8). The state payload is a tuple the runtime persists in
the state store per key, exactly-once under checkpointing.

Scale notes: state is partitioned by key across executors (size =
O(active keys)); timeouts bound lifetime. Arrow batches in/out — the
Python worker sees a pandas frame per (key, micro-batch).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, n_events long, total_value double, "
              "first_us long, last_us long")
STATE_SCHEMA = "n long, total double, first_us long, last_us long"


def _update_user_totals(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState) -> Iterable[pd.DataFrame]:
    """Running per-user totals across micro-batches. Emits the UPDATED
    running row for every batch in which the user appears (an update-mode
    stream of per-key accumulators)."""
    if state.exists:
        n, total, first_us, last_us = state.get
    else:
        n, total, first_us, last_us = 0, 0.0, None, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo = int(pdf["us"].min())
        hi = int(pdf["us"].max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, total, first_us, last_us))
    yield pd.DataFrame([{
        "user_id": key[0], "n_events": n, "total_value": total,
        "first_us": first_us, "last_us": last_us,
    }])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running totals per user — the custom-operator shape the
    built-in windows can't express (state survives across micro-batches,
    output is the running value, not a window close)."""
    return (
        events.select("user_id", "value", "us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
