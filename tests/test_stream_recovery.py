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


def test_file_sink_exactly_once_after_injected_crash(spark, tmp_path):
    """End-to-end exactly-once (VERDICT r5 #6): a parquet FILE SINK
    survives a crash injected in the classic window — after the sink
    committed a batch's files but BEFORE the engine recorded the batch
    commit. On restart the engine replays the batch from the offset
    log; the sink's own transaction log (_spark_metadata) makes the
    replay idempotent, so the sink output equals the batch twin with
    no duplicates and no loss."""
    import os

    import pyarrow.parquet as pq

    from utility_service_areas_spark.sources.tables import raw_table_schema

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "ckpt")

    table = pq.read_table("/root/testdata/sf0.001/events.parquet")
    third = table.num_rows // 3
    t0 = int(os.path.getmtime("/root/testdata/sf0.001/events.parquet"))
    for i in range(3):
        lo = i * third
        hi = table.num_rows if i == 2 else (i + 1) * third
        path = str(src / f"b{i}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path)
        os.utime(path, (t0 + i, t0 + i))  # deterministic batch order

    schema = raw_table_schema(spark, "/root/testdata/sf0.001", "events")

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .select("event_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # three micro-batches committed: engine commits 0,1,2
    committed = sorted(
        int(f) for f in os.listdir(ckpt + "/commits") if not f.startswith(".")
    )
    assert committed == [0, 1, 2]

    # Inject the crash: batch 2's sink files are on disk and in
    # _spark_metadata, but the ENGINE commit marker is gone — exactly
    # the state a crash between the two commits leaves behind.
    os.remove(ckpt + "/commits/2")
    # the local FS keeps a checksum sidecar next to the commit file; a
    # real crash leaves neither, and a stale .crc blocks the replay's
    # commit rename
    crc = ckpt + "/commits/.2.crc"
    if os.path.exists(crc):
        os.remove(crc)
    drain()  # restart: engine replays batch 2; sink must dedup it

    got = (
        spark.read.parquet(out)  # respects _spark_metadata
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    want = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    got_m = {r.event_type: (r.n, round(r.sv, 6)) for r in got.collect()}
    want_m = {r.event_type: (r.n, round(r.sv, 6)) for r in want.collect()}
    assert got_m == want_m  # no dup, no loss
    # distinct event ids also intact (duplicates would keep counts even
    # only if loss balanced them — this pins both independently)
    assert (
        spark.read.parquet(out).select("event_id").distinct().count()
        == table.num_rows
    )
