"""Set operations, sampling, splits, counts (SURVEY.md §2.5, §2.8).

Reference parity map:
- A1 global count       — ``A related code.txt:77``
- U1 unionAll           — ``A related code.txt:80``
- U2 Bernoulli sample   — ``A related code.txt:78``
- U3 seeded randomSplit — ``MarchineLearningAlgorithm.txt:91`` (seed 754)

The reference has no ``groupBy().agg()`` (SURVEY §2.5) but its report's
Tableau pivot implies group-by-count; the idiomatic realization lives
in ``__spark_entry__`` as plain ``df.groupBy(...).count()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def global_count(df: DataFrame) -> int:
    """A1: action — full count. The reference runs two of these to
    compute an undersampling ratio (``A related code.txt:77``); callers
    that need several counts over the same frame should cache it first
    (the reference rescans — do not replicate)."""
    return df.count()


def union_all(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """U1: bag-semantics positional union (``A related code.txt:80``).

    ``unionAll`` is an alias of ``union`` in Spark >= 2.0; duplicates
    are kept, matching is by column POSITION. Union is shuffle-free —
    partitions of the inputs are simply concatenated.
    """
    out = first
    for df in rest:
        out = out.unionAll(df)
    return out


def sample_fraction(df: DataFrame, fraction: float, *, seed: int = 754, with_replacement: bool = False) -> DataFrame:
    """U2: per-partition Bernoulli sample (``A related code.txt:78``).

    The reference passes no seed; the engine REQUIRES one (defaulting
    to the reference's own split seed 754) because reproducibility is
    the reference's stated rule (``MarchineLearningAlgorithm.txt:87-91``).
    Note: results are deterministic per (seed, partitioning) — pin the
    input partitioning in tests.
    """
    return df.sample(withReplacement=with_replacement, fraction=fraction, seed=seed)


def seeded_random_split(df: DataFrame, weights: Sequence[float] = (0.8, 0.2), seed: int = 754) -> list[DataFrame]:
    """U3: seeded train/test split — ``randomSplit(Array(0.8, 0.2), 754)``
    (``MarchineLearningAlgorithm.txt:91``, ``...USElectionPrediction
    .txt:106``). Each downstream action rescans the parent; cache the
    parent before splitting when both halves are consumed."""
    return df.randomSplit(list(weights), seed=seed)
