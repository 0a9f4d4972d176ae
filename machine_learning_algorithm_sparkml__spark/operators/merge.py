"""CDC upsert — MERGE INTO emulation without a table format.

Delta/Iceberg ship MERGE natively; on plain parquet the idiomatic
emulation is: keep target rows whose key has no update (left anti
join), union the source rows. One shuffle on the key (both legs);
the result is written back partition-complete.

At 100 TB: partition the target by a stable column and restrict the
anti-join + rewrite to partitions the source actually touches
(classic partition-overwrite upsert) — the helper takes an optional
pre-filter for exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    *,
    target_prefilter: Column | None = None,
) -> DataFrame:
    """Rows of ``source`` replace same-key rows of ``target``; all
    other target rows pass through. Schemas must match by position.

    ``target_prefilter`` narrows the rewritten region (partition
    pruning at scale); rows excluded by the filter are NOT returned —
    the caller overwrites only that region.
    """
    base = target.filter(target_prefilter) if target_prefilter is not None else target
    kept = base.join(source.select(key), on=key, how="left_anti")
    return kept.unionByName(source)
