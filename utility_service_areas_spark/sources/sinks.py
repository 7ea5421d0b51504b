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


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC export (columnar interchange with Hive/Trino estates).

    Same pruning story as parquet: ORC carries min/max stripe stats,
    so Spark pushes predicates into the scan (PushedFilters) and a
    partitioned layout prunes directories — pinned by
    tests/test_sinks.py."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compress: bool = True
) -> None:
    """JSON-lines export — the interchange format LLM data pipelines
    actually trade in (one document object per line; gzip by default
    so the text corpus ships compressed). Spark's json source reads
    the output back schema-complete, including nested arrays."""
    w = df.write.mode(mode)
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction (table maintenance): rewrite a parquet
    dataset into ceil(rows / target) right-sized files.

    Streaming sinks and fine-grained incremental loads accumulate
    thousands of small files; scan cost then scales with file count,
    not bytes. Rewrites to a sibling temp dir and swaps via rename —
    on an object store, swap a table-format manifest (Iceberg/Delta
    commit) instead; the repartition-and-rewrite plan is identical.
    Returns the new file count.
    """
    import math
    import os
    import shutil

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    # Crash hygiene (ADVICE r6+r7): a previously killed run can leave
    # tmp/old dirs behind. One window needs RECOVERY, not cleanup: a
    # kill between os.rename(path, old) and os.rename(tmp, path) leaves
    # path missing and old holding the only committed copy — deleting
    # old there would lose the dataset permanently. Roll the swap back
    # first; only then are any remaining tmp/old garbage (stale tmp
    # would otherwise swap an OLD rewrite into place, stale old would
    # make os.rename(path, old) fail), so pre-clean them.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        # A failure between the two renames would otherwise leave the
        # dataset path missing entirely; restore the original and let
        # the caller retry.
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return n_files
