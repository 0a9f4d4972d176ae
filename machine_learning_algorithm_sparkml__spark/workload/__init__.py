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
# least-recently-verified keys FIRST each round. Round-16 window, per
# VERDICT r15 "Next round" #1/#2/#5/#7: (1) multimodal_meta — the one
# r10-stale key, slipped from the r15 window (VERDICT #1 names it the
# window head); (2) the 17 keys NEW this round, never driver-checked
# (exact-substring decontamination, BPE trainer + trainer→inference
# composition, the six staged codec surfaces — interlaced/RGBA PNG,
# gray JPEG, interlaced GIF, MP4 container meta, FLAC STREAMINFO —
# the 12-bit SOF1 + 4:1:1 JPEG decodes that close VERDICT #8, and
# the Exif-walk, audio-stats, dHash image-dedup, mojibake-repair,
# tar-ingestion, and MP3-walk surfaces);
# (3) the first 32 keys of the 50-key r11-stale block (VERDICT #5).
# The last 18 of the r11 block (all low-risk oracle-backed SQL/set-op
# keys) slip to the tail and head the r17 window. Regenerate the
# staleness table with `python tools/staleness.py` after each round's
# CORRECTNESS file lands.
PRIORITY_KEYS = [
    # --- r16 window (50 slots; driver records indices 0-49) ---
    # Slot 0: the r10-stale slip (VERDICT r15 #1 head):
    "multimodal_meta",
    # Slots 1-17: the 17 keys NEW this round, never driver-checked:
    "decontaminate_exact_substring",
    "text_bpe_learned",
    "text_bpe_train_tokenize",
    "multimodal_png_interlaced_decode",
    "multimodal_png_rgba_decode",
    "multimodal_jpeg_gray_decode",
    "multimodal_jpeg12_decode",
    "multimodal_jpeg411_decode",
    "multimodal_gif_interlaced_decode",
    "multimodal_mp4_meta",
    "multimodal_flac_meta",
    "multimodal_wav_stats",
    "multimodal_exif_meta",
    "multimodal_dhash_neardup",
    "text_encoding_repair",
    "scan_tar",
    "multimodal_mp3_meta",
    # Slots 18-49: the first 32 keys of the r11-stale block in
    # staleness order (VERDICT r15 #5):
    "agg_count",
    "agg_cube",
    "agg_distinct_count",
    "agg_distinct_setops_sketch",
    "agg_groupby_count",
    "agg_heavy_hitters",
    "agg_incremental_merge",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_rollup",
    "asof_join",
    "corpus_shuffle_epoch",
    "embedding_neardup",
    "filter_and_not",
    "filter_dropna",
    "filter_eq",
    "join_anti",
    "join_drop_dup_key",
    "join_full_outer",
    "join_left_outer",
    "join_semi",
    "json_extract",
    "merge_upsert",
    "ml_model_save_load",
    "pivot_status_by_priority",
    "project_alias_cast",
    "project_select",
    "random_split",
    "range_join",
    "sample_fraction",
    "scan_parquet",
    "set_except",
    # --- slip tail (positions 50-67): the last 18 of the r11 block,
    "set_intersect",
    "simsearch_brp",
    "simsearch_ivf",
    "simsearch_lsh",
    # displaced by the new-key slots; they head the r17 window ---
    "simsearch_pq",
    "sink_csv",
    "sink_orc",
    "sort_limit_topk",
    "sql_collation_ci",
    "sql_collation_unicode",
    "sql_tpch_q12",
    "sql_tpch_q16",
    "sql_tpch_q4",
    "sql_tpch_q7",
    "text_bm25",
    "union_all",
    "unpivot_wide_metrics",
    "window_rank_topk",
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
