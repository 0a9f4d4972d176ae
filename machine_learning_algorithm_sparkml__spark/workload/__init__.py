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
# least-recently-verified keys FIRST each round. After the r6 window
# landed, the oldest rows are the 30 r4-stale relational/analytics
# keys (VERDICT r6 #1); new r7 keys lead so none joins the
# never-checked list, and the remaining slots start draining the r5
# block (the rest of it rotates in r8). Regenerate the staleness table
# with `python tools/staleness.py` after each round's CORRECTNESS
# file lands.
PRIORITY_KEYS = [
    # new in round 7 (never driver-checked):
    "decontaminate_fuzzy_large",
    "doc_chunk_long",
    "sql_tpch_q4",
    "sql_tpch_q16",
    "simsearch_ivfpq",
    "sql_tpch_q7",
    "sql_tpch_q14",
    "sql_tpch_q19",
    "sql_tpch_q22",
    "sql_tpch_q13",
    "agg_hll_sketch_merge",
    # last driver-checked in round 4 (oldest rows):
    "agg_count",
    "agg_cube",
    "agg_distinct_count",
    "agg_groupby_count",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_rollup",
    "asof_join",
    "domain_top_docs",
    "embedding_quantize_int8",
    "join_anti",
    "join_full_outer",
    "join_left_outer",
    "join_semi",
    "json_extract",
    "merge_upsert",
    "pivot_status_by_priority",
    "random_split",
    "range_join",
    "sample_fraction",
    "semantic_dedup",
    "set_except",
    "set_intersect",
    "sort_limit_topk",
    "text_gopher_quality",
    "text_normalize",
    "text_unigram_familiarity",
    "union_all",
    "unpivot_wide_metrics",
    "window_rank_topk",
    # head of the r5-stale block (the rest rotates in round 8):
    "agg_approx",
    "agg_conditional",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_stats",
    "agg_string_collect",
    "decontaminate_ngram",
    "dedup_clusters",
    "dedup_exact",
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
