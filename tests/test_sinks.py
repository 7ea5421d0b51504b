"""Sink tests: partitioned layout must yield partition pruning on
read-back; bucketed tables must skip the join exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from tests.test_plans import plan_of
from utility_service_areas_spark.sources.sinks import (
    write_bucketed_table,
    write_csv,
    write_partitioned,
)
from utility_service_areas_spark.sources.tables import load_table


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    orders = load_table(spark, SMOKE_SF, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    filtered = back.filter(F.col("o_orderstatus") == "F")
    plan = plan_of(filtered)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    assert filtered.count() == orders.filter("o_orderstatus = 'F'").count()


def test_bucketed_join_skips_exchange(spark, tmp_path):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a managed-table location left by a previous session survives
        # the in-memory catalog's DROP — clear it or saveAsTable fails
        loc = f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/{t}"
        shutil.rmtree(loc, ignore_errors=True)
    orders = load_table(spark, SMOKE_SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SMOKE_SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed_table(li, "b_lineitem", "l_orderkey", n_buckets=8)
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = plan_of(joined, "simple")
    # co-bucketed join: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == orders.join(li, orders.o_orderkey == li.l_orderkey).count()


def test_csv_export_round_trip(spark, tmp_path):
    region = load_table(spark, SMOKE_SF, "region")
    path = str(tmp_path / "region_csv")
    write_csv(region, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == region.count()
    assert set(back.columns) == set(region.columns)


def test_leaflet_map_sink_self_contained(spark, tmp_path):
    """Map presentation layer (reference index.qmd): one HTML file,
    FeatureCollection inlined and parseable, leaflet from CDN, every
    non-geometry column a popup property."""
    import json
    import re

    from pyspark.sql import functions as F

    from utility_service_areas_spark.operators.geo import rect_geometry
    from utility_service_areas_spark.sources.geojson import write_leaflet_map

    df = spark.createDataFrame(
        [("CERT-1", "Alpha Utility", 0.0), ("CERT-2", "Beta Co", 10.0)],
        ["certificate_number", "name", "x0"],
    ).select(
        "certificate_number",
        "name",
        rect_geometry(F.col("x0"), F.lit(0.0), F.lit(5.0), F.lit(4.0)).alias(
            "geometry"
        ),
    )
    out = str(tmp_path / "map.html")
    assert write_leaflet_map(df, out) == out
    html = open(out).read()
    assert "unpkg.com/leaflet@1.9.4" in html and "L.geoJSON" in html
    m = re.search(r"const areas = (\{.*?\});\n", html, re.DOTALL)
    fc = json.loads(m.group(1))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    props = {f["properties"]["certificate_number"] for f in fc["features"]}
    assert props == {"CERT-1", "CERT-2"}
    ring = fc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed ring survives the round trip
    # presentation parity (index.qmd): base-layer switcher + scale bar
    assert "L.control.layers" in html and "L.control.scale" in html


def test_leaflet_map_community_sidebar(spark, tmp_path):
    """Community-pin sidebar parity (index.qmd:169-189 + its TODO):
    pins are inlined (self-contained, no runtime CSV fetch), the
    sidebar/zoom/reset machinery ships, and a hostile community name
    cannot break out of the script block (same XSS discipline as the
    feature properties)."""
    import json
    import re

    from pyspark.sql import functions as F

    from utility_service_areas_spark.operators.geo import rect_geometry
    from utility_service_areas_spark.sources.geojson import write_leaflet_map

    df = spark.createDataFrame(
        [("CERT-1", 0.0)], ["certificate_number", "x0"]
    ).select(
        "certificate_number",
        rect_geometry(F.col("x0"), F.lit(0.0), F.lit(5.0), F.lit(4.0)).alias(
            "geometry"
        ),
    )
    pins = spark.createDataFrame(
        [("Anchorage", 61.2, -149.9), ("</script><b>x", 60.0, -150.0)],
        ["name", "lat", "lon"],
    )
    out = str(tmp_path / "map.html")
    write_leaflet_map(df, out, communities=pins)
    html = open(out).read()
    m = re.search(r"const communities = (\[.*?\]);\n", html, re.DOTALL)
    got = json.loads(m.group(1))
    assert {p["name"] for p in got} == {"Anchorage", "</script><b>x"}
    # the raw terminator never appears inside the script payload
    assert "</script><b>x" not in html  # escaped to </script...
    # sidebar machinery: list-in-bounds, zoom-to-pin, reset view
    assert "showSidebar" in html and "flyTo" in html and "Reset view" in html
    assert 'id="sidebar"' in html
    # without communities the sidebar layer list stays minimal
    out2 = str(tmp_path / "map2.html")
    write_leaflet_map(df, out2)
    assert "const communities = [];" in open(out2).read()


def test_leaflet_map_escapes_untrusted_properties(spark, tmp_path):
    """Stored-XSS guard (ADVICE r5): property values come from untrusted
    KML/HTML fetches. A '</script>' value must not terminate the inlined
    script block, and popup HTML must be built via textContent, never
    string-interpolated innerHTML."""
    import json
    import re

    from pyspark.sql import functions as F

    from utility_service_areas_spark.operators.geo import rect_geometry
    from utility_service_areas_spark.sources.geojson import write_leaflet_map

    payload = "</script><script>alert(1)</script><img src=x onerror=alert(2)>"
    df = spark.createDataFrame([("CERT-1", payload)], ["certificate_number", "name"]).select(
        "certificate_number",
        "name",
        rect_geometry(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0)).alias("geometry"),
    )
    out = str(tmp_path / "map.html")
    write_leaflet_map(df, out, title="<script>bad</script>")
    html = open(out).read()
    # the raw close-tag must never appear inside the inlined JSON/title
    body = html.split("const areas = ", 1)[1]
    assert "</script><script>" not in html
    assert "<script>bad" not in html  # title is HTML-escaped
    # the payload survives escaped and round-trips intact
    m = re.search(r"const areas = (\{.*?\});\n", html, re.DOTALL)
    assert json.loads(m.group(1))["features"][0]["properties"]["name"] == payload
    # popups are DOM-built: no template-string innerHTML of property values
    assert "textContent" in body and "innerHTML" not in body


def test_compact_dataset_reduces_files_preserves_rows(spark, tmp_path):
    from utility_service_areas_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "frag")
    src = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    src.repartition(64).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 32  # genuinely fragmented

    n_files = compact_dataset(spark, path, target_rows_per_file=5_000)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 2
    assert n_after == 2
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))


def test_compact_dataset_recovers_from_stale_crash_dirs(spark, tmp_path):
    """A previously killed compaction leaves __compact_tmp__ /
    __compact_old__ behind; a retry must pre-clean them and succeed
    with the CURRENT data, not swap in the stale rewrite (ADVICE r6)."""
    from utility_service_areas_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "ds")
    spark.range(0, 1_000).withColumn("v", F.col("id")).repartition(8).write.parquet(
        path
    )
    # plant stale crash leftovers with DIFFERENT (old) contents
    spark.range(0, 7).write.parquet(path + ".__compact_tmp__")
    spark.range(0, 9).write.parquet(path + ".__compact_old__")

    n_files = compact_dataset(spark, path, target_rows_per_file=1_000)
    assert n_files == 1
    got = spark.read.parquet(path)
    assert got.count() == 1_000  # current data, not the stale 7-row tmp
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_compact_dataset_recovers_mid_swap_crash(spark, tmp_path):
    """ADVICE r7 (high): a kill BETWEEN os.rename(path, old) and
    os.rename(tmp, path) leaves path missing and __compact_old__
    holding the only committed copy. A retry must roll the swap back
    (old → path) before pre-cleaning — deleting both dirs there would
    permanently lose the dataset."""
    from utility_service_areas_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "ds")
    # Simulate the crash window: committed data sits at old, tmp holds
    # the in-flight compacted rewrite, and path does not exist.
    spark.range(0, 1_000).withColumn("v", F.col("id")).repartition(4).write.parquet(
        path + ".__compact_old__"
    )
    spark.range(0, 1_000).withColumn("v", F.col("id")).write.parquet(
        path + ".__compact_tmp__"
    )
    assert not os.path.exists(path)

    n_files = compact_dataset(spark, path, target_rows_per_file=1_000)
    assert n_files == 1
    got = spark.read.parquet(path)
    assert got.count() == 1_000  # the committed copy survived the retry
    assert got.agg(F.sum("v")).collect()[0][0] == sum(range(1_000))
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC interchange: values round-trip and a predicate reaches the
    ORC scan as PushedFilters (stripe-stat pruning at scale)."""
    from utility_service_areas_spark.sources.sinks import write_orc

    path = str(tmp_path / "orc")
    src = spark.range(0, 1_000).withColumn("v", F.col("id") * 3)
    write_orc(src, path)
    back = spark.read.orc(path)
    assert back.count() == 1_000
    assert back.agg(F.sum("v")).collect()[0][0] == 3 * sum(range(1_000))
    plan = back.filter(F.col("v") > 2000)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(v,2000)" in plan


def test_jsonl_roundtrip_documents_shape(spark, tmp_path):
    """JSON-lines export (the LLM-corpus interchange format): nested
    arrays and text round-trip schema-complete through gzip."""
    from utility_service_areas_spark.sources.sinks import write_jsonl

    path = str(tmp_path / "jsonl")
    src = spark.createDataFrame(
        [(1, "hello <world>", ["a", "b"]), (2, 'quote " and \\ slash', [])],
        ["doc_id", "text", "tags"],
    )
    write_jsonl(src, path)
    import glob
    assert glob.glob(path + "/*.json.gz")  # compressed lines on disk
    back = spark.read.json(path)
    got = {r.doc_id: (r.text, list(r.tags or [])) for r in back.collect()}
    assert got == {1: ("hello <world>", ["a", "b"]), 2: ('quote " and \\ slash', [])}
