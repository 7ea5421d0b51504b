"""Packed-binary geometry codec: roundtrip exactness, area-off-buffer,
Spark column plumbing, and null/degenerate safety."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from utility_service_areas_spark.functions.wkb import (
    decode_polygon,
    encode_polygon,
    wkb_area,
)

IRREGULAR = [
    [[0.0, 0.0], [7.3, 0.1], [6.9, 4.2], [3.1, 6.8], [-0.5, 3.3], [0.0, 0.0]],
    # hole
    [[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 3.0], [2.0, 2.0]],
]


def test_roundtrip_bit_exact():
    assert decode_polygon(encode_polygon(IRREGULAR)) == IRREGULAR
    assert encode_polygon(None) is None and decode_polygon(None) is None


def test_area_off_buffer_matches_nested():
    from utility_service_areas_spark.functions.geometry import polygon_area

    assert math.isclose(wkb_area(encode_polygon(IRREGULAR)), polygon_area(IRREGULAR))


def test_spark_wkb_pipeline(spark):
    from utility_service_areas_spark.functions.geometry import st_area
    from utility_service_areas_spark.functions.wkb import (
        st_area_wkb,
        st_as_wkb,
        st_from_wkb,
    )
    from utility_service_areas_spark.plans.geo_queries import _nation_rects

    rects = _nation_rects(spark, SMOKE_SF)
    out = (
        rects.withColumn("wkb", st_as_wkb("geometry"))
        .withColumn("back", st_from_wkb("wkb"))
        .select(
            "n_nationkey",
            st_area("geometry").alias("a_nested"),
            st_area_wkb("wkb").alias("a_wkb"),
            st_area("back").alias("a_roundtrip"),
            F.octet_length("wkb").alias("nbytes"),
        )
        .collect()
    )
    assert len(out) > 0
    for r in out:
        assert r["a_nested"] == r["a_wkb"] == r["a_roundtrip"]
        # 1 ring of 5 points: 4 + 4 + 5*16 = 88 bytes
        assert r["nbytes"] == 88
