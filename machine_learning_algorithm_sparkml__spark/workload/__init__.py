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
    relational,
    scale,
    streaming,
)

# Order matters: the driver's correctness sweep records only the first
# ~50 keys, so modules whose keys lack a driver correctness row go FIRST.
# llm (30), streaming (8), and scale (4) had no CORRECTNESS_r02 rows;
# relational/analytics/ml are already driver-green from r1/r2.
ALL_QUERY_MODULES = [llm, streaming, scale, relational, analytics, ml]


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
