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
# least-recently-verified keys FIRST each round. Round-8 window
# (VERDICT r7 #1-#3): the two keys added after the r7 window froze
# (never driver-checked), the eight new r8 keys, the three keys whose
# oracles were upgraded in r7 but whose latest driver rows predate
# the upgrade, then the r5-stale block. The list is 54 keys for a
# ~50 window: the final FOUR (window_lag_lead, window_moving_avg,
# window_ntile_cume, window_range_time — plain window functions,
# lowest-risk of the r5 block) may slip to the r9 head along with the
# two keys oracle-upgraded mid-r8 outside this window
# (decontaminate_fuzzy/_large; the minhash/simhash/frames upgrades
# ARE in-window via the r5 block). Regenerate the staleness table with
# `python tools/staleness.py` after each round's CORRECTNESS file
# lands.
PRIORITY_KEYS = [
    # never driver-checked (added after the r7 window froze):
    "dedup_passage",
    "graph_triangle_count",
    # new in round 8 (never driver-checked):
    "sql_tpch_q17",
    "session_window_native",
    "sql_tpch_q8",
    "sql_tpch_q15",
    "split_leakage_safe",
    "text_bigram_familiarity",
    "layout_zorder",
    "mixture_token_budget",
    # oracle upgraded in r7, driver row still r6 rows-only:
    "multimodal_decode",
    "multimodal_features",
    "graph_pagerank",
    # the full r5-stale block (oldest remaining rows):
    "dedup_minhash",
    "dedup_minhash_mllib",
    "dedup_ngram_jaccard",
    "dedup_pipeline_keep",
    "dedup_simhash",
    "doc_chunk_fixed",
    "doc_fingerprint",
    "doc_hash_split",
    "doc_pack_sequences",
    "doc_tokens_explode",
    "event_funnel",
    "filter_outlier_iqr",
    "mixture_weighted_sample",
    "ml_cross_validate",
    "ml_evaluate_accuracy",
    "ml_fit_predict_eval",
    "ml_one_hot",
    "ml_pipeline",
    "ml_random_forest",
    "ml_string_index",
    "ml_string_index_multi",
    "ml_text_features",
    "ml_undersample_balance",
    "ml_vector_assemble",
    "multimodal_frames",
    "retention_cohort",
    "sample_stratified",
    "scalar_date_funcs",
    "scalar_string_funcs",
    "text_lang_id",
    "text_pii_redact",
    "text_quality",
    "text_quality_filter",
    "text_token_count",
    "text_top_terms",
    "text_zscore_by_lang",
    "window_first_last",
    "window_lag_lead",
    "window_moving_avg",
    "window_ntile_cume",
    "window_range_time",
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
