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
# least-recently-verified keys FIRST each round. Round-12 window,
# exactly as VERDICT r11 "Next round" #1/#2/#3/#4/#6 directs: (1) the
# six keys new this round (portable semdedup/PQ oracles + the
# unblocked partsupp quartet); (2) the r7-stale block — oldest rows in
# the registry; (3) the r8-stale fill led by the eight rows-only ML
# keys. Slip tail = the rest of the r8 block, heading the r13
# rotation. Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # --- r12 window (50 slots; driver records indices 0-49) ---
    # Slots 0-5: keys NEW this round, never driver-checked — the two
    # portable-oracle upgrades (VERDICT r11 #2/#4) and the unblocked
    # partsupp TPC-H quartet (VERDICT r11 #3, synthesized partsupp):
    "semantic_dedup_portable",
    "simsearch_pq_portable",
    "simsearch_ivfpq_portable",
    "sql_tpch_q2",
    "sql_tpch_q9",
    "sql_tpch_q11",
    "sql_tpch_q20",
    "timeseries_downsample_ohlc",
    "sample_reservoir_per_group",
    "streaming_corpus_dedup",
    "retrieval_hybrid",
    # Slots 6-27: the r7-stale block — the oldest driver rows in the
    # registry after the r11 sweep (staleness.py r7 row, 22 keys,
    # includes semantic_dedup whose portable sibling now anchors the
    # family and simsearch_ivfpq, the last rows-only composite ANN):
    "agg_approx",
    "agg_conditional",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_hll_sketch_merge",
    "agg_stats",
    "agg_string_collect",
    "decontaminate_ngram",
    "dedup_clusters",
    "dedup_exact",
    "doc_chunk_long",
    "domain_top_docs",
    "embedding_quantize_int8",
    "semantic_dedup",
    "simsearch_ivfpq",
    "sql_tpch_q13",
    "sql_tpch_q14",
    "sql_tpch_q19",
    "sql_tpch_q22",
    "text_gopher_quality",
    "text_normalize",
    "text_unigram_familiarity",
    # Slots 28-49: r8-stale fill — the eight ML keys VERDICT r11 #6
    # names (rows-only since r8) plus their oracle-backed feature
    # siblings, then the r8 dedup/doc block (oracle-backed anchors at
    # the slip boundary per the window-bookkeeping rule):
    "ml_random_forest",
    "ml_pipeline",
    "ml_evaluate_accuracy",
    "ml_cross_validate",
    "ml_fit_predict_eval",
    "ml_undersample_balance",
    "ml_text_features",
    "sample_stratified",
    "ml_string_index",
    "ml_string_index_multi",
    "ml_one_hot",
    "ml_vector_assemble",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_passage",
    "dedup_pipeline_keep",
    "dedup_simhash",
    # --- slip tail (positions 50+): doc_chunk_fixed / doc_fingerprint
    # / doc_hash_split / doc_pack_sequences / doc_tokens_explode
    # displaced from indices 45-49 by the late-round additions
    # (simsearch_ivfpq_portable, timeseries_downsample_ohlc,
    # sample_reservoir_per_group, streaming_corpus_dedup,
    # retrieval_hybrid — the window-bookkeeping rule: slip
    # oracle-backed low-risk keys); with the remaining r8 block they
    # head the r13 rotation ---
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
