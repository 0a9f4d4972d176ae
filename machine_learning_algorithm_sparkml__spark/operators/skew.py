"""Skew-handling utilities (SURVEY.md §7.5).

AQE's skew-join splitting handles most sort-merge skew automatically
(enabled in ``session.py``); salting is the manual fallback for the
cases AQE can't fix — e.g. a skewed AGGREGATION key, or a shuffle-hash
join where one key holds >1% of a 100 TB fact table (the reference's
own data is skewed: its largest exploration group is 34,884 of 309,355
rows — DOCX ``word/media/image2.png``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's key with a random
    bucket, replicate the small side once per bucket, join on
    (key, salt). The hot key's rows spread over ``salt_buckets``
    tasks instead of one straggler.

    Cost model: small side is replicated ``salt_buckets``x — use only
    when `small` is dimension-sized but too big (or too skew-prone)
    to broadcast outright.

    Only join types where the replicated side never surfaces unmatched
    are allowed: a right/full outer join would emit each unmatched
    small-side row once PER SALT BUCKET.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; '{how}' would duplicate "
            "unmatched small-side rows once per salt bucket"
        )
    salted_big = big.withColumn("_salt", (F.rand(seed=754) * salt_buckets).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def salted_aggregate_count(df: DataFrame, key: str, *, salt_buckets: int = 16) -> DataFrame:
    """Two-phase skew-proof count: partial count per (key, salt), then
    final sum per key. The hot key's partials spread across tasks;
    the second shuffle carries at most ``salt_buckets`` rows per key.
    (For plain counts Spark's map-side partial aggregation already
    does this implicitly; the pattern matters for aggregates whose
    state is large — collect_set, exact distinct — where per-task
    state for a hot key would not fit.)"""
    partial = (
        df.withColumn("_salt", (F.rand(seed=754) * salt_buckets).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_rows"))
