"""Driver-contract workload: named queries + DuckDB oracle SQL.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLE: dict[str, str]`` (ANSI SQL for DuckDB over
the same parquet tables). ``__spark_entry__`` at the repo root merges
them. Keys follow SURVEY.md §2's query-key column.

Column-name discipline: the driver compares Spark vs oracle results by
sorting columns BY NAME and hashing values, so every computed column is
aliased identically on both sides.
"""

from machine_learning_algorithm_sparkml__spark.workload import (
    analytics,
    llm,
    ml,
    quality,
    relational,
    scale,
    streaming,
)

# Order matters: the driver's correctness sweep records only the first
# ~50 keys, in dict-insertion order, so the rotation puts the
# least-recently-verified keys FIRST each round. r5's window covered
# analytics + ml + llm; for r6 PRIORITY_KEYS pins the keys that have
# NEVER had a driver correctness row (added late in r5, after the
# window closed) plus any key new this round, then the module order
# continues with relational (r4-stale) and streaming/scale/quality.
PRIORITY_KEYS = [
    # never driver-checked (added late in round 5):
    "profile_table",
    "scd2_intervals",
    "fuzzy_join_blocked",
    "scalar_array_map_funcs",
    "scalar_math_funcs",
    "sql_tpch_q3",
    "timeseries_gapfill",
    "stream_stream_join",
    "graph_pagerank",
    # new in round 6:
    "ml_model_save_load",
    "dedup_keep_best",
    "sql_tpch_q5",
    "sql_tpch_q18",
    "text_repetition_bigram",
    "dedup_incremental",
    "simsearch_pq",
    "decontaminate_fuzzy",
    "sql_tpch_q10",
    "sql_tpch_q6",
    # last driver-checked in round 3 (2 rounds stale — oldest rows):
    "embedding_neardup",
    "join_bucketed",
    "join_skew_salted",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_meta",
    "session_stats",
    "sessionize",
    "simsearch_brp",
    "simsearch_ivf",
    "simsearch_lsh",
    "simsearch_topk",
    "sink_json",
    "sink_partitioned_scan",
    "stream_static_join",
    "streaming_dedup",
    "streaming_session_window",
    "streaming_sliding_counts",
    "streaming_stateful_totals",
    "streaming_window_counts",
]

ALL_QUERY_MODULES = [relational, streaming, scale, quality, analytics, ml, llm]


def _merged(attr):
    merged = {}
    for mod in ALL_QUERY_MODULES:
        merged.update(getattr(mod, attr))
    out = {k: merged[k] for k in PRIORITY_KEYS if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_queries():
    return _merged("QUERIES")


def all_oracles():
    return _merged("ORACLE")
