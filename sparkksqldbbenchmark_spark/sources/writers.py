"""Table writers for the 100 TB layout (SURVEY §7 scale design).

- partitioned parquet: coarse time/category partitions → partition pruning
  on read (the first 100×-scale lever; a filter on the partition column
  skips whole directories).
- bucketed tables: pre-shuffled on the join key so repeated big⋈big joins
  co-locate without re-shuffling (saveAsTable — bucketing needs catalog
  metadata).

Writers only declare layout; no collects, no driver-side data movement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Parquet partitioned by low-cardinality columns (date buckets,
    categories). Partition column cardinality discipline: aim for
    10²-10⁴ directories, never per-key."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket columns
    skip the shuffle entirely when both sides share the bucketing."""
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
