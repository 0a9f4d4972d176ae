"""Sessionization (SURVEY.md §7.4 / guide "common OLAP patterns").

Gap-based sessions over an event stream, expressed relationally:
``lag(ts)`` per user -> boolean "new session" flag on gap > threshold
-> running sum of flags = session index. One shuffle (by user), two
window passes over the same partitioning (Spark reuses the exchange).
Fully SQL-expressible -> oracle-checked.

The streaming-native equivalent is ``session_window(ts, gap)`` /
``applyInPandasWithState``; the relational form is the batch/backfill
path a 100 TB pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Attach a per-user ``session_id`` (0-based) to every event.

    A new session starts when the gap since the user's previous event
    exceeds ``gap_minutes``. Deterministic tie-break: events ordered by
    (ts, event_id) within user.
    """
    order = [F.col(ts_col).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = float(gap_minutes * 60)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # double-seconds (micro precision) — NOT unix_timestamp, which
    # truncates to whole seconds and disagrees with fractional oracles
    ts_sec = F.col(ts_col).cast("double")
    prev_sec = prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | ((ts_sec - prev_sec) > gap_sec), 1).otherwise(0)
    with_flag = events.withColumn("new_session", is_new)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        with_flag.withColumn("session_id", F.sum("new_session").over(running) - 1)
        .drop("new_session")
    )
