"""Custom stateful streaming operator: session windows via
applyInPandasWithState.

Spark's built-in ``session_window`` covers plain gap-sessionization (see
plans/streaming_queries.py); this module is the template for semantics the
built-ins can't express — arbitrary per-key state machines.  State is one
open session per user; closed sessions emit as soon as a batch observes
the gap, and the event-time timeout flushes a session once the watermark
passes its gap deadline.  At scale: state is hash-partitioned by key in
the state store, sized O(active keys), and the watermark bounds retention.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
    ]
)
# open session: (start_us, last_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _emit(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "session_start": [pd.Timestamp(start_us, unit="us")],
            # session extends one gap past the last event — matches the
            # built-in session_window's end semantics.
            "session_end": [pd.Timestamp(last_us + GAP_MS * 1000, unit="us")],
            "n_events": pd.Series([n], dtype="int64"),
        }
    )


def _sessionize_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _emit(user_id, start_us, last_us, n)
        return

    rows = pd.concat(list(pdfs))
    ts_us = sorted(int(t.value) // 1000 for t in rows["ts"])
    if state.exists:
        start_us, last_us, n = state.get
        pending = ts_us
    else:
        start_us = last_us = ts_us[0]
        n = 1
        pending = ts_us[1:]

    out = []
    for t in pending:
        if t - last_us <= GAP_MS * 1000:
            # merge; an event out-of-order ACROSS micro-batches (arrives
            # within allowed lateness but older than the stored last_us)
            # must never move the session end backwards — shrinking
            # session_end would mis-split later events vs the builtin
            # session_window.  An early straggler may still extend start.
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1
        else:
            out.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1

    state.update((start_us, last_us, n))
    # flush the open session once the watermark passes last + gap
    deadline_ms = last_us // 1000 + GAP_MS
    state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
    for s, e, c in out:
        yield _emit(user_id, s, e, c)


def sessionize(events: DataFrame, watermark_delay: str = "0 seconds") -> DataFrame:
    """Gap-based sessionization with custom per-user state.

    Emits (user_id, session_start, session_end, n_events); sessions still
    open when the stream's watermark stops advancing stay in state (the
    honest streaming answer — they aren't over yet).
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- online anomaly scoring: running z-score per event type -----------------
# State is three integers (n, Σcents, Σcents²) per key — integer-exact, so
# the streaming scores are bit-identical to the batch window twin
# (plans/observability_queries.py::running_zscore) for any batch SLICING
# of an event-time-ordered arrival: the sort below fixes order within a
# batch, but state accumulates in ARRIVAL order across batches, so a
# source that delivers a later-timestamped file before an earlier one
# scores both against a different prefix than the batch twin.  That is
# the inherent contract of an online score (you can only standardize
# against what has arrived); an out-of-order-tolerant variant would
# buffer rows in state until the watermark passes them — a different,
# latency-trading operator.  The registered stream replays a
# chronologically written file source, where the two are identical.

ZSCORE_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("c", LongType()),
        StructField("n_prior", LongType()),
        StructField("zscore", DoubleType()),
    ]
)
ZSCORE_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("ss", LongType()),
    ]
)


def _zscore_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    etype = str(key[0])
    rows = pd.concat(list(pdfs))
    # deterministic processing order regardless of batch slicing
    rows = rows.sort_values(["ts", "event_id"])
    n, s, ss = state.get if state.exists else (0, 0, 0)
    out_id, out_c, out_np, out_z = [], [], [], []
    for eid, c in zip(rows["event_id"], rows["c"]):
        c = int(c)
        z = None
        if n >= 2:
            mean = s / n
            var = (ss - s * s / n) / (n - 1)
            if var > 0:
                z = (c - mean) / var**0.5
        out_id.append(int(eid))
        out_c.append(c)
        out_np.append(n)
        out_z.append(z)
        n, s, ss = n + 1, s + c, ss + c * c
    state.update((n, s, ss))
    yield pd.DataFrame(
        {
            "event_type": etype,
            "event_id": pd.Series(out_id, dtype="int64"),
            "c": pd.Series(out_c, dtype="int64"),
            "n_prior": pd.Series(out_np, dtype="int64"),
            "zscore": pd.Series(out_z, dtype="float64"),
        }
    )


def running_zscore(events: DataFrame) -> DataFrame:
    """Per-event online anomaly score: z of this event's cents value
    against the running mean/sample-variance of all PRIOR events of its
    type.  The per-key state machine built-ins can't express — state is
    O(keys) x 3 longs, emission is per-event, and integer accumulators
    make the scores batch-replayable exactly."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _zscore_fn,
        ZSCORE_OUTPUT,
        ZSCORE_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
