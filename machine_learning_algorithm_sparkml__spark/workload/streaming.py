"""Streaming + event-analytics query keys over the ``events`` table.

``streaming_window_counts`` actually drives a Structured Streaming
query (memory sink, complete mode, processAllAvailable) and is STILL
oracle-checked: over a bounded source, complete-mode windowed counts
equal the batch aggregation, which DuckDB replicates with time_bucket.

``sessionize`` is the relational sessionization operator (lag + running
sum), oracle-checked against the identical SQL window program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.operators.sessions import sessionize
from machine_learning_algorithm_sparkml__spark.sources import load_table
from machine_learning_algorithm_sparkml__spark.streaming import run_streaming_window_counts


def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_window_counts(spark, sf_dir, window_duration="1 hour")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = sessionize(events, gap_minutes=30)
    return out.select("event_id", "user_id", "ts", "session_id")


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregate — the downstream consumer shape: events
    per session and session length in seconds."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, gap_minutes=30)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts").cast("double") - F.min("ts").cast("double")).alias("duration_sec"),
        )
    )


def q_streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-type totals; over the bounded source the final emission equals
    the batch aggregation -> oracle-checked."""
    from machine_learning_algorithm_sparkml__spark.streaming.stateful import (
        run_stateful_running_totals,
    )

    return run_stateful_running_totals(spark, sf_dir)


QUERIES = {
    "streaming_window_counts": q_streaming_window_counts,
    "streaming_stateful_totals": q_streaming_stateful_totals,
    "sessionize": q_sessionize,
    "session_stats": q_session_stats,
}

ORACLE = {
    "streaming_stateful_totals": """
        SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    "streaming_window_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR (epoch(ts) - epoch(LAG(ts) OVER w)) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - 1 AS BIGINT) AS session_id
        FROM flagged
    """,
    "session_stats": """
        WITH flagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR (epoch(ts) - epoch(LAG(ts) OVER w)) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT event_id, user_id, ts,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1 AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               epoch(MAX(ts)) - epoch(MIN(ts)) AS duration_sec
        FROM sessions
        GROUP BY user_id, session_id
    """,
}
