"""Bucketized range join (guide: "common OLAP patterns").

A join on ``low <= point < high`` with NO equi-key gives Spark only a
nested-loop plan — quadratic at scale. The standard fix: quantize the
range dimension into fixed-width buckets, explode each range over the
buckets it spans, and equi-join on the bucket before applying the
exact range filter. The nested loop becomes a hash join whose
candidate count follows true overlap density.

Bucket width is the tuning knob: width ~ median range span keeps the
per-range explosion O(1) while keeping buckets selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketized_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    low_col: str,
    high_col: str,
    *,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to range rows where
    ``low_col <= point_col < high_col`` via bucket equi-join.

    Both inputs keep all their columns; callers project afterwards.
    Inner join only: the post-join range filter would silently drop
    the null-extended rows an outer join produces.
    """
    if how.lower() != "inner":
        raise ValueError(
            "bucketized_range_join is inner-only: the exact range filter "
            "after the bucket join discards outer-join null extensions"
        )
    p = points.withColumn("_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)))
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(low_col) / F.lit(bucket_width)),
                F.floor(F.col(high_col) / F.lit(bucket_width)),
            )
        ),
    )
    joined = p.join(r, "_bucket", how)
    return joined.filter(
        (F.col(point_col) >= F.col(low_col)) & (F.col(point_col) < F.col(high_col))
    ).drop("_bucket")
