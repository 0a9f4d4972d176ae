"""Change-data-capture: diff two table snapshots into a change set.

The inverse of ``operators/upsert.py``'s MERGE-apply: given yesterday's
and today's snapshot of a keyed table, emit one row per changed key
labeled insert / update / delete. This is how pipelines without a
log-based CDC source (the common case for vendor dumps and bulk
exports) recover an incremental feed from full snapshots — at 100 TB
the change set is usually orders of magnitude smaller than either
snapshot, so everything downstream (merge, re-index, re-embed) runs on
the diff instead of the world.

Plan shape: ONE full-outer join on the key columns — both snapshots
shuffle once on the same key (or not at all when both are bucketed on
it), unchanged rows are filtered before anything else consumes the
diff. No driver-side materialization at any size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    *,
    soft_delete_col: str | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots.

    Returns one row per key present in either snapshot whose state
    changed: ``change_type`` in {'insert', 'update', 'delete'}, the
    key columns, and ``old_<c>`` / ``new_<c>`` for every compared
    column. Keys with identical compared values are dropped (the
    usual >99% at steady state). NULL-safe comparison (``<=>``) so a
    NULL-to-value transition is an update, not an accidental match.

    ``key_cols`` may be composite — many snapshot feeds key on more
    than one column (order line = (orderkey, linenumber)); the join
    shuffles once on the full tuple either way.

    ``soft_delete_col``: vendor dumps often never physically remove a
    row — they flip a tombstone flag. When given, a row whose flag is
    true is treated as ABSENT from its snapshot (filtered before the
    join, so the tombstones never shuffle): live->tombstoned emits a
    'delete', tombstoned->live a resurrection 'insert', and a row
    tombstoned in both snapshots is the no-op it logically is. The
    flag column itself never appears in the diff output.
    """
    if soft_delete_col is not None:
        live = ~F.coalesce(F.col(soft_delete_col), F.lit(False))
        old = old.filter(live)
        new = new.filter(live)
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"_ok_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_nk_{key_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
