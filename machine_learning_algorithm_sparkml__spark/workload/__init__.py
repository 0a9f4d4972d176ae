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
# ~50 keys, so the rotation puts the least-recently-verified modules
# FIRST each round. r4's window covered quality + relational + the
# first 9 analytics keys; r5 leads with analytics (the 6 tail keys had
# no r3/r4 row and the module changed in r3) + ml (all 10 keys stale
# since r3's trim) + llm (tokens() changed in r4).
ALL_QUERY_MODULES = [analytics, ml, llm, streaming, scale, quality, relational]


def all_queries():
    out = {}
    for mod in ALL_QUERY_MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in ALL_QUERY_MODULES:
        out.update(mod.ORACLE)
    return out
