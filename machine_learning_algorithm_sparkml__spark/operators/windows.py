"""Window functions and top-k (SURVEY.md §2.6-2.7).

W1: partitioned rank, top-1-per-group — the reference's feature-
engineering core: per county, rank candidates by descending vote
fraction and keep rank 1 (``RandomeForestAnalysisOnUSElection
Prediction.txt:88-89`` window spec, ``:97-99`` rank+filter).

Scale notes: rank-then-filter-rank<=k is kept EXACTLY in this shape so
Spark's ``InferWindowGroupLimit`` (Spark >= 3.5) rewrites it into a
window group limit — each map task keeps only its local top-k before
the shuffle, so the exchange carries O(groups x k) rows, not the full
table. Never collect-and-rank on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """W1/W2: attach ``rank() OVER (PARTITION BY ... ORDER BY ...)``.

    ``order_by`` takes Column objects so descending order is expressed
    as ``F.desc("fraction_votes")`` exactly like the reference's
    ``col("fraction_votes").desc`` (``...USElectionPrediction.txt:88``).
    """
    spec = Window.partitionBy(*[F.col(c) for c in partition_by]).orderBy(*order_by)
    return df.withColumn(rank_col, F.rank().over(spec))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    *,
    rank_col: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    """Rank-then-filter top-k per group (the reference keeps k=1 and
    calls the survivors "winners", ``...USElectionPrediction.txt:97-99``).
    RANK semantics: ties all survive, like the reference."""
    ranked = rank_per_group(df, partition_by, order_by, rank_col=rank_col)
    out = ranked.filter(F.col(rank_col) <= F.lit(k))
    return out if keep_rank else out.drop(rank_col)


def sort_limit(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """Global top-n (SURVEY §2.7 ``sort_limit_topk``). Spark plans this
    as TakeOrderedAndProject: per-partition top-n, then a single-stage
    merge of n-row heaps — no full global sort even at 100 TB. Callers
    should include a unique tie-break column for determinism."""
    return df.orderBy(*order_by).limit(n)


def analytic_lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    *,
    offset: int = 1,
) -> DataFrame:
    """Per-group series analytics: ``lag``/``lead`` of the value column
    plus ``row_number`` — the previous/next-observation pattern of
    sessionized event analysis (additive; the reference uses only
    ``rank``, ``...USElectionPrediction.txt:89``).

    Scale: ONE shuffle on the partition keys serves all three window
    expressions (identical window spec -> a single Window physical
    node). ``order_by`` must include a unique tie-break column for
    deterministic lag/lead values."""
    spec = Window.partitionBy(*[F.col(c) for c in partition_by]).orderBy(*order_by)
    return df.select(
        "*",
        F.lag(value_col, offset).over(spec).alias(f"prev_{value_col}"),
        F.lead(value_col, offset).over(spec).alias(f"next_{value_col}"),
        F.row_number().over(spec).alias("seq"),
    )


def moving_aggregate(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    *,
    window_rows: int = 3,
) -> DataFrame:
    """Trailing moving average (last ``window_rows`` rows) and running
    total per group — explicit ROWS frames (the reference never uses
    frame specs; SURVEY §2.6 notes the gap).

    Both expressions share one window partitioning: one shuffle, two
    frames. Outputs are rounded because windowed SUM/AVG association
    order is engine-specific (Spark streams the frame; other engines
    may use segment trees), so the last ulp is not portable."""
    spec = Window.partitionBy(*[F.col(c) for c in partition_by]).orderBy(*order_by)
    trailing = spec.rowsBetween(-(window_rows - 1), 0)
    running = spec.rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        "*",
        F.round(F.avg(value_col).over(trailing), 6).alias(f"avg_{value_col}_{window_rows}"),
        F.round(F.sum(value_col).over(running), 4).alias(f"cum_{value_col}"),
    )
