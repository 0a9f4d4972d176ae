"""Physical data layout for scale (SURVEY.md §7.5): partitioned
writes (partition pruning) and bucketed tables (shuffle-free joins).

At 100 TB these two are the difference between scanning everything and
scanning almost nothing:

- ``write_partitioned`` + a filter on the partition column => Spark
  lists only the matching directories (partition pruning — check
  ``PartitionFilters`` in the scan).
- ``write_bucketed`` on the join key => two tables bucketed the same
  way join WITHOUT an exchange on either side (check the plan has no
  Exchange under the SortMergeJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str], *, mode: str = "overwrite") -> None:
    """Directory-partitioned parquet: one directory per distinct value
    tuple. Choose low-cardinality columns (date, region, status) — a
    10M-directory layout is worse than no partitioning."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    *,
    num_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (requires a metastore catalog —
    local Derby in tests, Hive/Glue in production). Joins and
    aggregations on ``bucket_by`` between tables with the same bucket
    count read co-located data and skip the shuffle."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name, format="parquet")


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
