"""Round-18 regression pins.

VERDICT r17 item 1: `medallion_stream_pipeline` failed the driver's
oracle with DATA_SOURCE_NOT_FOUND because the `versioned_table` Python
data source was registered only by `build_session`, and the driver
harness supplies its own SparkSession. The fix registers it inside the
query; this test runs the query through the driver's entry path
(`queries()` → a session WITHOUT prior registration) to pin that.
"""

from __future__ import annotations

import pytest

SMOKE_SF = "/root/testdata/sf0.001"


def test_cpu_spread_skip_if_broadcastable(spark):
    """VERDICT r17 item 3: a spread whose frame may become a broadcast
    build side must be suppressed while the input is under the
    broadcast threshold (an Exchange feeding a BroadcastExchange is
    pure overhead), and apply above it."""
    from pyspark.sql import functions as F

    from utility_service_areas_spark.operators.spread import cpu_spread
    from utility_service_areas_spark.sources.tables import load_table

    li = load_table(spark, SMOKE_SF, "lineitem")
    thresh = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    assert thresh > 0  # session default: 64 MiB

    # Under the threshold: guard suppresses the repartition entirely.
    guarded = cpu_spread(
        li, F.col("l_orderkey"), bytes_per_task=1, skip_if_broadcastable=True
    )
    assert "Repartition" not in guarded._jdf.queryExecution().analyzed().toString()

    # Same frame without the guard still spreads (the sf0.001 scan is
    # 1 partition wide, far under parallelism/4).
    plain = cpu_spread(li, F.col("l_orderkey"), bytes_per_task=1)
    assert "RepartitionByExpression" in (
        plain._jdf.queryExecution().analyzed().toString()
    )

    # Guard is inert once the input exceeds the threshold.
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        wide = cpu_spread(
            li, F.col("l_orderkey"), bytes_per_task=1,
            skip_if_broadcastable=True,
        )
        assert "RepartitionByExpression" in (
            wide._jdf.queryExecution().analyzed().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thresh))


_DRIVER_SIM = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

# Bare session exactly like the driver harness: NOT build_session, so
# none of the repo's Python data sources are registered up front.
spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from __spark_entry__ import SMOKE_SF_DIR, queries

q = queries()["medallion_stream_pipeline"]
got = {{
    r["o_orderpriority"]: (r["n_orders"], r["sum_cents"])
    for r in q(spark, SMOKE_SF_DIR).collect()
}}

from utility_service_areas_spark.sources.tables import load_table

orders = load_table(spark, SMOKE_SF_DIR, "orders")
expect = {{
    r["o_orderpriority"]: (r["n"], r["c"])
    for r in orders.filter(F.col("o_totalprice") > 150000)
    .groupBy("o_orderpriority")
    .agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("c"),
    )
    .collect()
}}
assert got == expect, (got, expect)
print("MEDALLION_DRIVER_SIM_OK")
spark.stop()
"""


def test_medallion_runs_under_driver_harness_session():
    """VERDICT r17 item 1: the driver's oracle failed with
    DATA_SOURCE_NOT_FOUND because `versioned_table` was registered only
    by build_session and the driver supplies its own SparkSession.
    Reproduce the driver exactly: a FRESH process, a bare
    SparkSession.builder session, `queries()` entry path. (A
    `newSession()` in this JVM cannot simulate it: Spark 4.1's
    registration uniqueness check is JVM-global while lookup is
    per-session, so a sibling session can neither register nor see the
    source — only a fresh process matches the driver.)"""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SIM.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MEDALLION_DRIVER_SIM_OK" in proc.stdout
