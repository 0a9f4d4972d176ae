from machine_learning_algorithm_sparkml__spark.streaming.events import (
    read_events_stream,
    run_stream_static_join,
    run_streaming_checkpoint_recovery,
    run_streaming_foreach_batch_upsert,
    run_streaming_late_data,
    run_streaming_dedup,
    run_streaming_session_windows,
    run_streaming_sliding_counts,
    run_streaming_window_counts,
    session_window_counts,
    sliding_event_counts,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sliding_event_counts",
    "session_window_counts",
    "run_streaming_window_counts",
    "run_streaming_sliding_counts",
    "run_streaming_session_windows",
    "run_streaming_dedup",
    "run_streaming_checkpoint_recovery",
    "run_streaming_foreach_batch_upsert",
    "run_streaming_late_data",
    "run_stream_static_join",
]
