"""Sinks (SURVEY.md §2.3): partitioned parquet layout and bucketed
tables — the write-side half of the 100 TB story. A partitioned
layout turns downstream predicate filters into partition pruning
(directories skipped at planning time); bucketing pre-shuffles a join
key so repeated joins/aggs on it skip their exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet. Readers filtering on
    partition_cols prune directories (visible as PartitionFilters in
    the scan node)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (pre-shuffled) managed table: joins and aggregations
    on ``bucket_col`` between co-bucketed tables skip the exchange."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header CSV export (reference writes its certificate list as
    CSV, R/functions.R:70)."""
    df.write.mode(mode).option("header", True).csv(path)
