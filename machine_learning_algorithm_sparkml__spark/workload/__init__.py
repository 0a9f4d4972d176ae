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
# least-recently-verified keys FIRST each round. Round-15 window,
# per VERDICT r14 "Next round" #1/#3/#4/#5/#7: (1) the 5 keys new
# this round (never driver-checked — DRI + progressive JPEG decode,
# exact-substring dedup, BPE tokenize + BPE-denominated budget);
# (2) 45 of the 46-key r10-stale block (the r14 slip tail). The 46th
# (multimodal_meta — r10 PASS, trivial metadata projection, the
# lowest-risk oracle-backed key of the block) slips to head the r16
# window: the never-checked-first rule outranks completing the
# r10 sweep in one round. Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # --- r15 window (50 slots; driver records indices 0-49) ---
    # Slots 0-4: the 5 keys NEW this round, never driver-checked:
    "multimodal_jpeg_dri_decode",
    "multimodal_jpeg_progressive_decode",
    "dedup_exact_substring",
    "text_bpe_tokenize",
    "mixture_token_budget_bpe",
    # Slots 5-49: the first 45 keys of the r10-stale block in
    # rotation-proposal order (VERDICT r14 #1):
    "join_inner_equi",
    "scan_csv_header",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "sql_tpch_q6",
    "scan_text_logs",
    "agg_decimal_exact",
    "agg_incremental_retract",
    "profile_table",
    "scd2_intervals",
    "fuzzy_join_blocked",
    "scalar_array_map_funcs",
    "scalar_math_funcs",
    "sql_tpch_q18",
    "sql_tpch_q10",
    "sql_frontend_conveniences",
    "streaming_window_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_dedup",
    "stream_static_join",
    "streaming_stateful_totals",
    "sessionize",
    "session_stats",
    "timeseries_gapfill",
    "stream_stream_join",
    "streaming_python_source_static_join",
    "streaming_python_source_windowed",
    "streaming_rocksdb_changelog",
    "streaming_state_reader",
    "streaming_state_changefeed",
    "join_skew_salted",
    "sink_partitioned_scan",
    "join_bucketed",
    "sink_json",
    "text_repetition_bigram",
    "ps_groupby_agg",
    "window_range_time",
    "dedup_minhash_mllib",
    "decontaminate_fuzzy_large",
    "dedup_incremental",
    "dedup_keep_best",
    "simsearch_topk",
    "simsearch_lsh_portable",
    "simsearch_ivf_portable",
    # --- slip tail (position 50): the one r10 key displaced by the
    # five new-key slots; heads the r16 window ---
    "multimodal_meta",
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
