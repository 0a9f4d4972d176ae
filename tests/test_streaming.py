"""Streaming semantics: the streaming windowed counts over the bounded
events source must equal the equivalent batch aggregation (Spark's
streaming/batch unification), and sessionization invariants hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.operators.sessions import sessionize
from machine_learning_algorithm_sparkml__spark.sources import load_table
from machine_learning_algorithm_sparkml__spark.streaming import run_streaming_window_counts


def test_streaming_counts_equal_batch(spark, sf_dir):
    stream_result = run_streaming_window_counts(spark, sf_dir, window_duration="1 hour")
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    s = sorted(map(tuple, stream_result.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_streaming_counts_total_matches_events(spark, sf_dir):
    result = run_streaming_window_counts(spark, sf_dir)
    total = result.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_sessionize_invariants(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, gap_minutes=30).cache()
    assert s.count() == events.count()
    # session ids are dense 0..max per user
    per_user = s.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.countDistinct("session_id").alias("n"),
    )
    bad = per_user.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1))
    assert bad.count() == 0
    s.unpersist()


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),
        (3, 100, "2024-01-01 01:00:00"),   # 50 min gap -> new session
        (4, 200, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = {r.event_id: r.session_id for r in sessionize(df, gap_minutes=30).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """Complete-mode session windows over the bounded stream equal the
    batch session_window aggregation (streaming/batch unification)."""
    from machine_learning_algorithm_sparkml__spark.streaming import (
        run_streaming_session_windows,
    )

    stream_result = run_streaming_session_windows(spark, sf_dir, gap="30 minutes")
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    s = sorted(map(tuple, stream_result.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_streaming_dedup_restores_uniqueness(spark, sf_dir):
    """Doubled stream -> dropDuplicatesWithinWatermark -> one row per
    event_id, matching the original table exactly."""
    from machine_learning_algorithm_sparkml__spark.streaming import run_streaming_dedup

    result = run_streaming_dedup(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    assert result.count() == n_events
    assert result.select("event_id").distinct().count() == n_events


def test_timeseries_gapfill_grid_is_dense(spark, sf_dir):
    """The per-user grid has no holes: row count per user equals the
    hour span + 1; gap rows carry n_events=0 and a non-null
    carried-forward value (first grid hour always has an event)."""
    from pyspark.sql import functions as F
    from machine_learning_algorithm_sparkml__spark.workload.streaming import (
        q_timeseries_gapfill,
    )

    out = q_timeseries_gapfill(spark, sf_dir)
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        ((F.max("hour_ts").cast("long") - F.min("hour_ts").cast("long")) / 3600 + 1).alias("span_hours"),
        F.sum(F.col("vmax_ff").isNull().cast("int")).alias("n_null_ff"),
        F.min((F.col("n_events") >= 0).cast("int")).alias("nonneg"),
    )
    bad = per_user.filter(
        (F.col("n_rows") != F.col("span_hours")) | (F.col("n_null_ff") > 0) | (F.col("nonneg") != 1)
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_stream_stream_join_time_bounds(spark, sf_dir):
    """Every emitted pair respects the (0, 30 min] lag bound and joins
    the same user's events."""
    from machine_learning_algorithm_sparkml__spark.workload.streaming import (
        q_stream_stream_join,
    )

    rows = q_stream_stream_join(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["lag_us"] <= 30 * 60 * 1_000_000, r
    # distinct pairs only
    pairs = [(r["view_id"], r["click_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
