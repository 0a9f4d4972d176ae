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
# least-recently-verified keys FIRST each round. Round-13 window,
# per VERDICT r12 "Next round" #1/#3/#4: (1) every key new this round
# (never driver-checked — 9 after the session-2 additions); (2) the
# full 32-key r8-stale block — the oldest driver rows in the registry
# (the r12 slip tail); (3) a fill from the oldest r9 rows. Slip tail =
# the displaced oracle-backed fill keys + the remaining r9 keys,
# heading the r14 rotation. Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # --- r14 staging: keys NEW this round lead (never driver-checked);
    # the full r14 window rewrite follows once the round's additions
    # are complete ---
    "multimodal_jpeg_decode",
    "scan_warc",
    "scan_warc_media",
    # --- r13 window (50 slots; driver records indices 0-49) ---
    # Slots 0-10: keys NEW this round, never driver-checked — the
    # oracle-backed near-dup twin (VERDICT r12 #3), the real
    # BMP/WAV decodes (VERDICT r12 #4 + its audio sibling), then the
    # session-2 additions: the real PNG decode (compressed format,
    # stdlib-zlib DEFLATE), gzip JSONL ingestion, the shuffle-free
    # token-entropy quality signal, the SQL-scripting WHILE loop, URL
    # canonicalization dedup, the bounded-window EWMA, asymmetric
    # containment dedup, and the from-scratch-LZW GIF decode (all
    # oracle-backed):
    "embedding_neardup_portable",
    "multimodal_decode_real",
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "scan_jsonl_gzip",
    "text_token_entropy",
    "sql_scripting_while",
    "dedup_url",
    "timeseries_ewma",
    "dedup_containment",
    "multimodal_gif_decode",
    # Slots 11-42: the complete r8-stale block (staleness.py r8 row,
    # 32 keys — no key's latest driver row may predate r9 after this
    # round, VERDICT r12 #1):
    "doc_chunk_fixed",
    "doc_fingerprint",
    "doc_hash_split",
    "doc_pack_sequences",
    "doc_tokens_explode",
    "event_funnel",
    "filter_outlier_iqr",
    "graph_pagerank",
    "graph_triangle_count",
    "layout_zorder",
    "mixture_token_budget",
    "mixture_weighted_sample",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "retention_cohort",
    "scalar_date_funcs",
    "scalar_string_funcs",
    "session_window_native",
    "split_leakage_safe",
    "sql_tpch_q15",
    "sql_tpch_q17",
    "sql_tpch_q8",
    "text_bigram_familiarity",
    "text_lang_id",
    "text_pii_redact",
    "text_quality",
    "text_quality_filter",
    "text_token_count",
    "text_top_terms",
    "text_zscore_by_lang",
    "window_first_last",
    # Slots 43-49: 7-key fill from the r9-stale block (oldest rows
    # after r8; includes ml_confusion per VERDICT r12 "keep the
    # invariant rows in rotation"):
    "agg_argmax_maxby",
    "agg_time_rollup",
    "cdc_snapshot_diff",
    "cdc_soft_delete",
    "dq_expectations",
    "dq_referential_integrity",
    "ml_confusion",
    # --- slip tail (positions 50+): embedding_quantize_arrow /
    # json_variant_extract /
    # layout_compaction /
    # layout_compaction_clustered /
    # ml_group_ols / ml_group_ridge / observe_metrics /
    # random_split_portable displaced from the window's tail by the
    # five session-2 additions (ml_confusion retained per VERDICT
    # r12's "keep in rotation"), after sample_hash_portable was
    # displaced from slot 49 by the late multimodal_wav_decode
    # addition (the window-bookkeeping rule: slip oracle-backed
    # low-risk keys), then the remaining 30 r9-stale keys; they head
    # the r14 rotation ---
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
