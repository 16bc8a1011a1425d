"""Gap-based sessionization — segment per-key ordered event streams
into sessions wherever the inter-event gap exceeds a threshold.

The reference's parser tokenizes a byte stream into spans by scanning
for boundary conditions (json/lexer.rs advances a cursor and CLOSES the
current token when a delimiter class appears); sessionization is the
same boundary-scan lifted to a distributed event table: the "delimiter"
is a time gap, the "token" is a session.

100 TB shape: ONE shuffle on the session key (Window.partitionBy), two
window functions that Spark fuses into a single sort within the
exchange — `lag` to see the previous timestamp and a running `sum` of
the boundary indicator to number sessions. No self-join, no explode,
no Python. Downstream per-session aggregation reuses the same
(key, session) grouping so AQE coalesces rather than re-shuffles.
Timestamps are compared in exact integer microseconds (unix_micros) so
boundary decisions are bit-identical across engines — a double `epoch`
would make `gap == threshold` FP-ambiguous.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 6 * 3600 * 1_000_000,
    order_cols: Sequence[str] = ("event_id",),
    out_col: str = "session_seq",
) -> DataFrame:
    """Append ``out_col``: 1-based session index per ``key``, ordered by
    (ts, *order_cols); a new session starts when the gap to the previous
    event is STRICTLY greater than ``gap_us`` microseconds. The
    tiebreaker columns make the segmentation deterministic under equal
    timestamps — without them, two equal-ts events could swap across a
    boundary between runs."""
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    # .cast("timestamp") tolerates TIMESTAMP_NTZ sources (session tz is
    # pinned to UTC in session.py, so the reinterpretation is a no-op).
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | (us - prev_us > F.lit(int(gap_us))), 1).otherwise(0)
    seq = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, seq.cast("int"))
