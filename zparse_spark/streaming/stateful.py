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
