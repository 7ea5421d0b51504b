"""Kafka-wire-shaped adapter for the events stream.

A production deployment reads `spark.readStream.format("kafka")`,
which yields the fixed wire schema
(key/value binary, topic, partition, offset, timestamp,
timestampType). No broker exists in this environment, so this module
supplies the two pure transformations around that boundary — they
work identically on batch and streaming DataFrames, which is how the
tests verify them without a broker:

- `events_from_wire`: wire rows → typed events rows (`from_json` on
  the value payload, key = user_id). This is the first operator after
  any Kafka source; everything downstream (tumbling_counts,
  sessionize, asof twins) is source-agnostic.
- `events_to_wire`: typed events → wire rows for a Kafka sink
  (`to_json` value, key chosen for partition affinity: user_id, so a
  user's events land in one partition and per-user state operators
  downstream see in-order data).

Scale posture: both directions are pure codegen projections (no UDF,
no shuffle); partition affinity by key is the lever that keeps
stateful consumers shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Payload carried in the Kafka value (ts as microseconds-since-epoch:
# JSON has no timestamp type, and micros round-trips Spark's
# timestamp exactly).
EVENT_PAYLOAD_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_to_wire(events: DataFrame, topic: str = "events") -> DataFrame:
    """Typed events → Kafka wire rows (key, value, topic).

    key = user_id string: Kafka hashes the key to a partition, so one
    user's events serialize into a single partition — downstream
    keyed-state operators then never reorder within a user.
    """
    payload = F.to_json(
        F.struct(
            F.col("event_id"),
            (F.unix_micros(F.col("ts"))).alias("ts_us"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def events_from_wire(wire: DataFrame) -> DataFrame:
    """Kafka wire rows → typed events rows (inverse of events_to_wire).

    Malformed payloads become null-column rows rather than failures
    (from_json PERMISSIVE default) — poison messages must never stall
    a stream; filter `event_id IS NULL` into a dead-letter sink.
    """
    parsed = F.from_json(F.col("value").cast("string"), EVENT_PAYLOAD_SCHEMA)
    return wire.select(
        F.col("key").cast("string").cast("long").alias("user_id"),
        parsed.alias("p"),
    ).select(
        F.col("p.event_id").alias("event_id"),
        F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
        "user_id",
        F.col("p.event_type").alias("event_type"),
        F.col("p.value").alias("value"),
        F.col("p.props").alias("props"),
    )
