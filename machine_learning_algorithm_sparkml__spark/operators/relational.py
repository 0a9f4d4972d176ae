"""Projections, column expressions, and filters (SURVEY.md §2.2-2.3).

Reference parity map:
- P1 column projection   — ``MarchineLearningAlgorithm.txt:62``
- P2 rename via alias    — ``RandomeForestAnalysisOnUSElectionPrediction.txt:71-78``
- P3 cast string→int/dbl — ``MarchineLearningAlgorithm.txt:75-79``
- P4 drop column         — ``RandomeForestAnalysisOnUSElectionPrediction.txt:69``
- F1 equality filter     — ``RandomeForestAnalysisOnUSElectionPrediction.txt:55``
- F2 AND + NOT filter    — ``RandomeForestAnalysisOnUSElectionPrediction.txt:99``
- F3 null-row drop       — ``MarchineLearningAlgorithm.txt:42``

Every function builds a lazy Catalyst plan; Catalyst pushes the
predicates and the pruned column set down to the parquet scan
(check with ``plans.inspect``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P1: keep a subset of columns. Column pruning reaches the scan."""
    return df.select(*[F.col(c) for c in columns])


def alias_cast(df: DataFrame, spec: Mapping[str, tuple[str, str | None]]) -> DataFrame:
    """P2+P3: project ``{out_name: (in_name, cast_type|None)}``.

    Mirrors the reference's rename-and-type projection
    (``RandomeForestAnalysisOnUSElectionPrediction.txt:69-78``:
    ``col("RHI125214").cast(DoubleType).alias("white")``). Spark's
    numeric narrowing cast truncates toward zero (unlike ANSI ROUND
    semantics in some engines) — oracle SQL must use TRUNC to match.
    """
    cols: list[Column] = []
    for out_name, (in_name, cast_type) in spec.items():
        c = F.col(in_name)
        if cast_type is not None:
            c = c.cast(cast_type)
        cols.append(c.alias(out_name))
    return df.select(*cols)


def drop_columns(df: DataFrame, *columns: Column | str) -> DataFrame:
    """P4: remove columns — used in the reference to drop the duplicate
    join key after an equi-join (``...USElectionPrediction.txt:69``)."""
    return df.drop(*columns)


def filter_eq(df: DataFrame, column: str, value: object) -> DataFrame:
    """F1: ``col == constant``. Pushed to the scan by Catalyst."""
    return df.filter(F.col(column) == F.lit(value))


def filter_and_not(df: DataFrame, eq_column: str, eq_value: object, not_column: str, not_value: object) -> DataFrame:
    """F2: ``eq_col == v AND NOT (not_col == w)`` — the reference's
    rank==1 AND NOT candidate=='Ben Carson' shape
    (``...USElectionPrediction.txt:99``)."""
    return df.filter((F.col(eq_column) == F.lit(eq_value)) & ~(F.col(not_column) == F.lit(not_value)))


def dropna_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F3: drop rows containing any null (``MarchineLearningAlgorithm
    .txt:42``: ``df.na.drop()``). ``subset`` narrows the checked columns
    — at wide-schema scale, checking only the columns you actually use
    keeps the filter cheap and pushdown-friendly."""
    return df.na.drop(subset=list(subset) if subset is not None else None)
