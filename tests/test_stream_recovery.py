"""Incremental + exactly-once semantics: a file-source stream with a
checkpoint processes newly-arrived files on restart without
double-counting the old ones.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from utility_service_areas_spark.sources.tables import load_table, raw_table_schema


def _drain(spark, src_dir, ckpt, out_name):
    schema = raw_table_schema(spark, "/root/testdata/sf0.001", "events")
    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r.event_type: r.n for r in spark.table(out_name).collect()}


def test_checkpoint_recovery_no_double_count(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # batch 1: sf0.001 events arrive
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "batch1.parquet")
    first = _drain(spark, str(src), ckpt, "t_recov1")
    base = {
        r.event_type: r.n
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert first == base

    # batch 2: the same data arrives again as a NEW file; restart from
    # the checkpoint → totals double exactly once (old file not re-read)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "batch2.parquet")
    second = _drain(spark, str(src), ckpt, "t_recov2")
    assert second == {k: 2 * v for k, v in base.items()}
