"""As-of join (nearest-previous-event join) — a pattern Spark lacks
natively (guide: "common OLAP patterns"). Implemented as a pure
DataFrame composition: union the two sides tagged by origin, sort
within each key by (time, origin), and carry the most recent left-side
ROW forward with ``last(ignorenulls=True)`` over a running window —
one shuffle on the key, no Python.

This is the backward as-of join (match the latest left row with
l.ts <= r.ts). The composition scales like any windowed aggregation:
state per key is O(1), the shuffle is by join key, and skewed keys
split under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For every right row, attach ``value_cols`` from the latest left
    row with the same ``key`` and ``left_ts <= right_ts``; nulls when
    no such row exists.

    All attached columns come from the SAME matched left row: the left
    side is carried as one struct, so a NULL in one value column stays
    NULL rather than being back-filled from an older row (DuckDB ASOF
    JOIN semantics). Ties (left_ts == right_ts) match, and among equal
    left timestamps the greatest value tuple wins (the struct is part
    of the window ordering) — deterministic given distinct value
    tuples.
    """
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_lrow"),
    )
    left_struct_type = dict(l_tagged.dtypes)["_lrow"]
    r_tagged = right.select(
        "*",
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(left_struct_type).alias("_lrow"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # left rows sort before right rows at equal ts (_side 0 < 1), so a
    # same-timestamp left row IS visible to the right row; among equal
    # left timestamps the struct ordering breaks the tie.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_lrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_lrow", ignorenulls=True).over(w).alias("_matched")
    )
    right_cols = [c for c in right.columns]
    return carried.filter(F.col("_side") == 1).select(
        *right_cols,
        *[F.col(f"_matched.{c}").alias(f"asof_{c}") for c in value_cols],
    )
