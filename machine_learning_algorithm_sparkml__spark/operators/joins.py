"""Joins (SURVEY.md §2.4).

The reference's only join (J1) is an inner equi-join with a cast on one
key side, followed by dropping the duplicate key column:
``RandomeForestAnalysisOnUSElectionPrediction.txt:58`` (join expr with
``cast(IntegerType)``) and ``:69`` (``.join`` + ``.drop``).

Scale notes: Spark selects broadcast-hash automatically when one side
is below ``spark.sql.autoBroadcastJoinThreshold`` (and AQE can promote
at runtime from observed sizes). For dimension tables we additionally
hint ``F.broadcast`` — at 100 TB the fact side must never shuffle for a
dim join. Casting the key ONCE in a projection before the join (rather
than inside the join condition, as the reference does) keeps the key
expression stable so Catalyst can still use it for pruning/reordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inner_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    cast_right_key: str | None = None,
    broadcast_right: bool = False,
    drop_right_key: bool = True,
) -> DataFrame:
    """J1 + P4: inner equi-join, optional key cast, drop duplicate key.

    ``cast_right_key`` mirrors ``results_rep.col("fips") ===
    county.col("fips").cast(IntegerType)`` (``...USElectionPrediction
    .txt:58``); ``drop_right_key`` mirrors ``.drop(county.col("fips"))``
    (``:69``). ``broadcast_right=True`` for bounded dimension tables.
    """
    rhs = F.broadcast(right) if broadcast_right else right
    rkey = rhs[right_key]
    if cast_right_key is not None:
        rkey = rkey.cast(cast_right_key)
    joined = left.join(rhs, left[left_key] == rkey, "inner")
    if drop_right_key:
        joined = joined.drop(rhs[right_key])
    return joined
