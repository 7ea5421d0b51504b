"""Parquet table loaders for the test substrate (TESTDATA.md).

At cluster scale these would be catalog tables (partitioned /
bucketed); here they are bare parquet files, which still exercises
Catalyst's predicate pushdown and column pruning — the operators only
`select` what they need so `ReadSchema` stays narrow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries must behave identically under ANY caller-built session
    (the verification driver constructs its own): events.parquet needs
    the nanos-as-long legacy read, and timestamp semantics must be
    UTC so collected values match the (naive) DuckDB oracle. Both are
    runtime-settable SQL confs; setting them here makes every query
    self-sufficient."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet; with
    spark.sql.legacy.parquet.nanosAsLong it arrives as ns-since-epoch.
    Convert to a proper timestamp (µs, matching DuckDB's truncation).
    Integer `div` — a double division would lose precision at 1e18 ns.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every substrate table as a temp view so users can run
    plain `spark.sql(...)` against the engine (same names DuckDB's
    oracle side uses)."""
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
