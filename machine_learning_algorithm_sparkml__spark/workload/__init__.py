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
# least-recently-verified keys FIRST each round. Round-14 window,
# per VERDICT r13 "Next round" #1: (1) the 3 keys new this round
# (never driver-checked); (2) the complete 39-key r9-stale block (the
# r13 slip tail — after this round no registry key's latest driver row
# predates r10); (3) an 8-key fill from the oldest r10 rows, leading
# with the keys VERDICT r13 named (decontaminate_fuzzy,
# join_inner_equi, scan_csv_header, TPC-H q3/q5/q6). Slip tail = the
# remaining 39 r10 keys in rotation-proposal order, heading the r15
# window. Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # --- r14 window (50 slots; driver records indices 0-49) ---
    # Slots 0-9: the 10 keys NEW this round, never driver-checked —
    # the real baseline JPEG decode (VERDICT r13 #4) and its 4:2:0
    # subsampled sibling, the palette-PNG variant, WARC archive
    # ingestion (VERDICT r13 #3), the mixed-content WARC scan that
    # dispatches the codec by mime, the member-per-record .warc.gz
    # layout, JVM-side HTML main-content extraction, the
    # archive→HTML-extract composition, link-graph extraction, and
    # PageRank over the extracted link graph (all oracle-backed):
    "multimodal_jpeg_decode",
    "multimodal_jpeg420_decode",
    "multimodal_png8_decode",
    "scan_warc",
    "scan_warc_media",
    "scan_warc_gzip",
    "text_html_extract",
    "scan_warc_html",
    "text_html_links",
    "graph_link_pagerank",
    # Slots 10-48: the complete 39-key r9-stale block (staleness.py
    # r9 row = the r13 slip tail, VERDICT r13 #1 — after this round
    # no key's latest driver row predates r10):
    "embedding_quantize_arrow",
    "json_variant_extract",
    "layout_compaction",
    "layout_compaction_clustered",
    "ml_group_ols",
    "ml_group_ridge",
    "observe_metrics",
    "random_split_portable",
    "sample_hash_portable",
    "sample_stratified_portable",
    "scalar_try_funcs",
    "scan_binary_files",
    "scan_csv_malformed",
    "scan_json_malformed",
    "scan_python_datasource",
    "scan_python_datasource_pushdown",
    "scan_schema_evolution",
    "scan_xml",
    "sink_dynamic_partition_overwrite",
    "sink_python_datasource",
    "sql_lateral_agg",
    "sql_lateral_topn",
    "sql_recursive_cte",
    "sql_recursive_cte_bounded",
    "sql_session_variables",
    "sql_tpch_q21",
    "sql_udf_scalar_table",
    "streaming_checkpoint_recovery",
    "streaming_foreach_batch_upsert",
    "streaming_late_data",
    "streaming_python_source",
    "streaming_rocksdb_state",
    "streaming_upsert_restart",
    "udtf_dynamic_schema",
    "udtf_partition_stats",
    "udtf_token_runs",
    "window_lag_lead",
    "window_moving_avg",
    "window_ntile_cume",
    # Slot 49: 1-key fill from the oldest r10 rows (the first key
    # VERDICT r13 #1 named; the r9 sweep satisfies the
    # no-row-predates-r10 criterion regardless of fill size):
    "decontaminate_fuzzy",
    # --- slip tail (positions 50+): the remaining 46 r10 keys in
    # rotation-proposal order (join_inner_equi, scan_csv_header,
    # sql_tpch_q3/q5/q6, scan_text_logs, and agg_decimal_exact
    # displaced from the fill by the seven late key additions); they
    # head the r15 window ---
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
