"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful streaming at all (SURVEY.md §2.10 — its
polling loop is stateless batch); this module supplies the arbitrary-state
surface Spark adds: a per-user running aggregate that survives across
micro-batches, the shape used for online counters, rate limiting, feature
freshness, or incremental dedup state at 100 TB.

Why applyInPandasWithState and not a windowed agg: the state here is
*unbounded and user-defined* (running totals since stream start, plus a
high-water mark) — not expressible as a watermark-bounded window. State is
partitioned by the group key, so it scales horizontally with executors; each
micro-batch ships only that batch's rows through Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_ts_ms long"
)
STATE_SCHEMA = "n long, s double, m long"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running state and emit
    the updated totals (one row per user per batch)."""
    n, s, m = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, int(pdf["ts_ms"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_ts_ms": [m],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user: (n_events, sum_value, max_ts_ms)
    updated every micro-batch. Works only on a streaming DataFrame (the
    batch equivalent is a plain groupBy — see the test, which pins
    stream-final-state == batch-aggregate)."""
    return (
        events.select("user_id", "value", "ts_ms")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
