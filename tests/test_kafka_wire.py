"""Kafka-wire adapter: batch round-trip fidelity + streaming
transformability (the same expressions must plan on a readStream
DataFrame, which is how they'd sit directly behind a Kafka source).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from utility_service_areas_spark.sources.tables import load_table
from utility_service_areas_spark.streaming.events import read_events_stream, run_to_memory
from utility_service_areas_spark.streaming.kafka_wire import (
    events_from_wire,
    events_to_wire,
)


def test_wire_round_trip_batch(spark):
    ev = load_table(spark, SMOKE_SF, "events")
    back = events_from_wire(events_to_wire(ev))
    assert back.schema == ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).schema
    # exact row-set equality both directions (subtract is symmetric-diff here)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    a, b = ev.select(*cols), back.select(*cols)
    assert a.subtract(b).count() == 0
    assert b.subtract(a).count() == 0


def test_wire_malformed_payload_survives(spark):
    wire = spark.createDataFrame(
        [(b"7", b"{not json"), (b"8", b'{"event_id": 1, "ts_us": 1000000, '
                                      b'"event_type": "click", "value": 2.0, "props": "{}"}')],
        ["key", "value"],
    ).withColumn("topic", F.lit("events"))
    rows = {r.user_id: r for r in events_from_wire(wire).collect()}
    assert rows[8].event_id == 1 and rows[8].event_type == "click"
    assert rows[7].event_id is None  # poison message → null row, not a crash


def test_wire_transforms_plan_on_stream(spark, tmp_path):
    stream = read_events_stream(spark, SMOKE_SF)
    wired = events_from_wire(events_to_wire(stream))
    assert wired.isStreaming
    run_to_memory(
        wired.groupBy("event_type").count(), "kafka_wire_smoke", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM kafka_wire_smoke").collect()
    batch = (
        load_table(spark, SMOKE_SF, "events").groupBy("event_type").count().collect()
    )
    assert {(r.event_type, r["count"]) for r in got} == {
        (r.event_type, r["count"]) for r in batch
    }
