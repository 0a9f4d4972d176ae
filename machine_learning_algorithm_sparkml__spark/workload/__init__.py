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
# least-recently-verified keys FIRST each round. Round-10 window,
# exactly as pre-declared in ROUND9.md §12 + VERDICT r9 "Next round":
# (1) keys NEW this round (never driver-checked) and the four
# decimal-output keys whose contract changed this round (r9 hash-fails
# fixed by emitting BIGINT cents/milli-units — each needs a driver row
# under the NEW output schema); (2) window_range_time (r5 row, oracle
# upgraded since); (3) the contract trio dedup_minhash_mllib /
# decontaminate_fuzzy / decontaminate_fuzzy_large (latest driver row
# predates the current oracle/witness contract); (4) simsearch_topk +
# the six r6 streaming keys; (5) the r6-stale block oldest-first. The
# slip tail past index ~50 is the lowest-risk end of the r6 block:
# rows-only ANN keys with pytest recall invariants, plain
# projections/filters exercised indirectly by nearly every other key —
# pre-adjudicated in ROUND10.md. Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # new in round 10 (never driver-checked):
    "scan_text_logs",
    "simsearch_lsh_portable",
    "streaming_python_source_static_join",
    "streaming_rocksdb_changelog",
    "sql_tpch_q12",
    "streaming_state_reader",
    "streaming_state_changefeed",
    "sql_collation_ci",
    "ps_groupby_agg",
    "simsearch_ivf_portable",
    "sql_frontend_conveniences",
    # contract changed in r10 (r9 hash-fails -> portable integer
    # outputs; driver must re-confirm under the new schema). New r10
    # keys are inserted ABOVE this comment as they land:
    "agg_decimal_exact",
    "agg_incremental_merge",
    "agg_incremental_retract",
    "streaming_python_source_windowed",
    # r5-stale (oracle upgraded since its last driver row):
    "window_range_time",
    # latest driver row predates the current oracle/output contract:
    "dedup_minhash_mllib",
    "decontaminate_fuzzy",
    "decontaminate_fuzzy_large",
    # oracle-backed anchor + the six r6 streaming keys:
    "simsearch_topk",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_dedup",
    "stream_static_join",
    "streaming_stateful_totals",
    "stream_stream_join",
    # the r6-stale block, oldest-first (staleness.py r6 rows):
    "streaming_window_counts",
    "scan_csv_header",
    "join_inner_equi",
    "join_skew_salted",
    "join_bucketed",
    "sql_tpch_q6",
    "sql_tpch_q3",
    "sql_tpch_q10",
    "sql_tpch_q18",
    "sql_tpch_q5",
    "dedup_keep_best",
    "dedup_incremental",
    "sink_partitioned_scan",
    "multimodal_meta",
    "sink_json",
    "sessionize",
    "fuzzy_join_blocked",
    "timeseries_gapfill",
    "scd2_intervals",
    "profile_table",
    "session_stats",
    "scalar_array_map_funcs",
    "scalar_math_funcs",
    "text_repetition_bigram",
    "ml_model_save_load",
    "sink_orc",
    "sink_csv",
    "scan_parquet",
    "join_drop_dup_key",
    "embedding_neardup",
    # slip tail (past the ~50-key window; pre-adjudicated lowest-risk:
    # rows-only ANN keys whose recall invariants run in pytest every
    # suite, and the plain projection/filter keys unchanged since r6):
    "simsearch_lsh",
    "simsearch_ivf",
    "simsearch_pq",
    "simsearch_brp",
    "project_select",
    "project_alias_cast",
    "filter_eq",
    "filter_and_not",
    "filter_dropna",
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
