from machine_learning_algorithm_sparkml__spark.operators.relational import (
    alias_cast,
    drop_columns,
    dropna_rows,
    filter_and_not,
    filter_eq,
    select_columns,
)
from machine_learning_algorithm_sparkml__spark.operators.joins import inner_equi_join
from machine_learning_algorithm_sparkml__spark.operators.windows import (
    rank_per_group,
    sort_limit,
    top_k_per_group,
)
from machine_learning_algorithm_sparkml__spark.operators.setops import (
    global_count,
    sample_fraction,
    seeded_random_split,
    union_all,
)

__all__ = [
    "alias_cast",
    "drop_columns",
    "dropna_rows",
    "filter_and_not",
    "filter_eq",
    "select_columns",
    "inner_equi_join",
    "rank_per_group",
    "sort_limit",
    "top_k_per_group",
    "global_count",
    "sample_fraction",
    "seeded_random_split",
    "union_all",
]
