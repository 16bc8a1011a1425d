"""Custom stateful streaming operator — running violation counters.

``applyInPandasWithState`` (SURVEY.md §2.6): maintains a per-rule_id
running total + last-seen timestamp across microbatches with explicit
GroupState. The built-in windowed aggregation (validate_stream module)
covers time-bucketed counts; this operator covers the genuinely
*cumulative* contract ("how many S1 violations ever, as of now") that
watermarked windows can't express without unbounded state — here state
is one row per rule_id, constant memory forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("total_violations", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("batches", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, batches = state.get if state.exists else (0, 0)
    new = 0
    for pdf in pdfs:
        new += len(pdf)
    total += new
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame(
        {"rule_id": [key[0]], "total_violations": [total], "batches_seen": [batches]}
    )


def running_violation_totals(stream_violations: DataFrame) -> DataFrame:
    """Cumulative per-rule violation totals over a violations stream.

    Input: streaming DataFrame with at least a ``rule_id`` column.
    Output (update mode): one row per rule_id per batch with the running
    total — the streaming analog of the verdict matrix's violation_count
    column, maintained incrementally.
    """
    return stream_violations.groupBy("rule_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_SESSION_GAP_MS = 6 * 3600 * 1000


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap-based streaming sessionization with explicit GroupState —
    the genuinely STATEFUL op the batch sessionizer (X82) mirrors: a
    session stays open across micro-batches until either a later event
    arrives past the gap (closed inline) or the event-time watermark
    passes last_event + gap (closed by TIMEOUT — the case that needs
    GroupState at all: no further event will ever arrive to close it)."""
    done: list[tuple[int, int, int]] = []
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        done.append((start, last, n))
    else:
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        evs: list[int] = []
        for pdf in pdfs:
            evs.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())  # ns -> ms
        for ms in sorted(evs):
            if start is None:
                start, last, n = ms, ms, 1
            elif ms - last > _SESSION_GAP_MS:
                done.append((start, last, n))
                start, last, n = ms, ms, 1
            else:
                last, n = max(last, ms), n + 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp(last + _SESSION_GAP_MS + 1)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(done),
            "session_start_ms": [d[0] for d in done],
            "session_end_ms": [d[1] for d in done],
            "n_events": [d[2] for d in done],
        }
    )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization (6h gap, matching the batch X82
    default): completed sessions only — a session emits exactly once,
    either when a past-gap event closes it or when the watermark times
    it out. Constant state per live user (3 longs), evicted on close."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
