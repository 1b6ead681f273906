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


# --------------------------------------------------------------------------
# Spark 4 transformWithState twin
# --------------------------------------------------------------------------


try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor as _SP
except ImportError:  # pragma: no cover - older Spark
    _SP = object


class _RunningTotalsProcessor(_SP):
    """``StatefulProcessor`` computing the same per-user running totals as
    ``user_running_totals`` through Spark 4's transformWithState API — the
    successor to applyInPandasWithState: named state variables (ValueState /
    ListState / MapState) with per-variable TTL, timers, and schema
    evolution, instead of one opaque state tuple. Requires the RocksDB
    state store provider (see ``tws_required_confs``), which is also the
    provider you want at 100 TB: state lives off-heap and spills to disk,
    bounded by neither executor heap nor micro-batch size.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, s, m = self._totals.get() if self._totals.exists() else (0, 0.0, 0)
        for pdf in rows:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, int(pdf["ts_ms"].max()))
        self._totals.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_ts_ms": [m],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's state protocol speaks protobuf between the JVM
    and the Python driver worker; without the ``protobuf`` package the
    worker crashes at init. Gate callers on this instead of failing deep
    inside a streaming query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_required_confs() -> dict[str, str]:
    """Session confs transformWithState needs (RocksDB-backed state)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    }


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`user_running_totals` —
    identical semantics, new-API state management."""
    if _SP is object:  # pragma: no cover - older Spark
        raise NotImplementedError("transformWithState needs Spark >= 4.0")
    return (
        events.select("user_id", "value", "ts_ms")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


# --------------------------------------------------------------------------
# streaming funnel (per-user step progression as keyed state)
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_OUTPUT_SCHEMA = "user_id long, step_reached int"
FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Advance one user's funnel (view -> click -> purchase, each step
    strictly after the previous) with this batch's events. Step times
    persist across batches. Assumes batches arrive in event-time order per
    key (file streams replaying history do; heavily late data can only
    under-count, never over-count, because steps require strictly-later
    timestamps).

    Vectorized: within one Arrow chunk the sequential scan's fixed point is
    closed-form — t1 is the earliest view, t2 the earliest click strictly
    after t1, t3 the earliest purchase strictly after t2 — three masked
    ``min``s instead of a per-row Python loop (the chunk needn't even be
    sorted). Chunk boundaries keep the scan order the row loop had."""
    import numpy as np

    t1, t2, t3 = state.get if state.exists else (None, None, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        et = pdf["event_type"].to_numpy()
        ts = pdf["ts_ms"].to_numpy(dtype=np.int64)
        if t1 is None:
            views = ts[et == FUNNEL_STEPS[0]]
            if views.size:
                t1 = int(views.min())
        if t1 is not None and t2 is None:
            clicks = ts[(et == FUNNEL_STEPS[1]) & (ts > t1)]
            if clicks.size:
                t2 = int(clicks.min())
        if t2 is not None and t3 is None:
            buys = ts[(et == FUNNEL_STEPS[2]) & (ts > t2)]
            if buys.size:
                t3 = int(buys.min())
    state.update((t1, t2, t3))
    reached = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
    yield pd.DataFrame({"user_id": [key[0]], "step_reached": [reached]})


def user_funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming funnel: per-user highest step reached, updated per batch.
    State is 3 longs per user — bounded by the user population, not the
    event volume, so it holds at 100 TB of replayed history."""
    return (
        events.select("user_id", "event_type", "ts_ms", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# state-store inspection (Spark 4 `statestore` reader)
# --------------------------------------------------------------------------


def running_totals_state(spark, checkpoint_path: str) -> DataFrame:
    """Read :func:`user_running_totals`'s live per-user state DIRECTLY from
    its streaming checkpoint via Spark 4's ``statestore`` batch reader —
    no replay, no stream restart, no memory-sink scrape.

    This is the ops surface a 100 TB stateful pipeline needs: the state
    store (RocksDB/HDFS-backed at scale) is itself a queryable table, so
    state audits ("is per-user state drifting from the batch recompute?"),
    state-size profiling per partition, and incident debugging are plain
    batch queries over the checkpoint — the stream keeps running. Reads the
    latest committed batch by default; pass ``.option("batchId", n)`` via
    the raw reader for time travel over retained checkpoints.
    """
    from pyspark.sql import functions as F

    st = spark.read.format("statestore").load(checkpoint_path)
    # key/value struct layout mirrors the groupBy key + STATE_SCHEMA tuple
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.n").alias("n_events"),
        F.col("value.groupState.s").alias("sum_value"),
        F.col("value.groupState.m").alias("max_ts_ms"),
    )


# --------------------------------------------------------------------------
# streaming transition matrix (per-user last-event state)
# --------------------------------------------------------------------------

TRANSITIONS_OUTPUT_SCHEMA = (
    "prev_type string, next_type string, n_transitions long"
)
TRANSITIONS_STATE_SCHEMA = "ts long, eid long, etype string"


def _update_transitions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Advance one user's transition counts with this batch: the state is
    just the LAST event seen (ts, event_id, type) — O(1) per user — so
    consecutive-pair counting seams correctly across micro-batches. Emits
    this batch's (prev, next, count) increments; the consumer sums. Same
    cross-batch ordering assumption as the funnel above."""
    last = state.get if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        if last is not None:
            state.update(last)
        yield pd.DataFrame(
            {"prev_type": [], "next_type": [], "n_transitions": []}
        ).astype({"n_transitions": "int64"})
        return
    pdf = pd.concat(frames).sort_values(["ts_ms", "event_id"])
    types = pdf["event_type"].tolist()
    prevs = ([last[2]] + types[:-1]) if last is not None else types[:-1]
    nexts = types if last is not None else types[1:]
    counts: dict[tuple[str, str], int] = {}
    for p, n in zip(prevs, nexts):
        counts[(p, n)] = counts.get((p, n), 0) + 1
    tail = pdf.iloc[-1]
    state.update((int(tail["ts_ms"]), int(tail["event_id"]), tail["event_type"]))
    yield pd.DataFrame(
        {
            "prev_type": [p for p, _ in counts],
            "next_type": [n for _, n in counts],
            "n_transitions": list(counts.values()),
        }
    )


def user_transitions_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of events_analytics.events_transition_matrix's count
    core: per-user last-event state seams pair counting across batches;
    the matrix itself stays an aggregation over the emitted increments
    (mergeable — sum of per-batch counts == batch count)."""
    return (
        events.select("user_id", "event_type", "ts_ms", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
            stateStructType=TRANSITIONS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
