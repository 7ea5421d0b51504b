"""Guard rails for the polygon broadcast-dict fast path (VERDICT r2
what's-wrong #2 / ADVICE r3): the driver-collected {id: rings} dict is
only sound for a dim-sized polygon frame with unique non-null ids.
Duplicate ids silently collapse two geometries onto one key — the bbox
join still emits a candidate per duplicate row, but every candidate
would verify against whichever geometry won the dict insert. These
tests pin the automatic fallback to the ship-geometry-rows path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from utility_service_areas_spark.operators import geo
from utility_service_areas_spark.operators.geo import (
    points_in_polygons,
    polygon_overlap_pairs,
    rect_geometry,
)


def _rects(spark, rows):
    """rows: (id, x0, y0, w, h) -> (id, geometry) frame."""
    df = spark.createDataFrame(rows, ["pid", "x0", "y0", "w", "h"])
    return df.select(
        "pid",
        rect_geometry(F.col("x0"), F.col("y0"), F.col("w"), F.col("h")).alias(
            "geometry"
        ),
    )


def test_duplicate_ids_fall_back_to_row_path(spark):
    # Two DISTINCT rectangles share id=1; a dict would keep only one of
    # them and the point in the other would wrongly fail verification.
    polys = _rects(spark, [(1, 0.0, 0.0, 1.0, 1.0), (1, 10.0, 10.0, 1.0, 1.0),
                           (2, 20.0, 20.0, 1.0, 1.0)])
    pts = spark.createDataFrame(
        [(100, 0.5, 0.5), (101, 10.5, 10.5), (102, 50.0, 50.0)],
        ["point_id", "px", "py"],
    )
    got = {
        (r.point_id, r.pid)
        for r in points_in_polygons(pts, polys, id_col="pid").collect()
    }
    assert got == {(100, 1), (101, 1)}  # BOTH id-1 rectangles matched

    pairs = polygon_overlap_pairs(polys, "pid")
    # ids are not unique -> row path; the two id-1 rects don't overlap
    # each other, and nothing overlaps id 2.
    assert pairs.collect() == []


def test_null_id_falls_back_and_still_verifies(spark):
    polys = _rects(spark, [(1, 0.0, 0.0, 1.0, 1.0)]).unionByName(
        _rects(spark, [(7, 5.0, 5.0, 1.0, 1.0)]).withColumn(
            "pid", F.lit(None).cast("long")
        )
    )
    pts = spark.createDataFrame([(100, 5.5, 5.5)], ["point_id", "px", "py"])
    out = points_in_polygons(pts, polys, id_col="pid").collect()
    assert len(out) == 1 and out[0].point_id == 100 and out[0].pid is None


def test_over_threshold_uses_row_path_same_result(spark, monkeypatch):
    polys = _rects(
        spark, [(i, float(3 * i), 0.0, 2.0, 2.0) for i in range(5)]
    )  # disjoint except adjacent bboxes touch? spaced 3 apart, width 2 -> disjoint
    pts = spark.createDataFrame(
        [(i, 3.0 * i + 1.0, 1.0) for i in range(5)], ["point_id", "px", "py"]
    )
    expect = {(i, i) for i in range(5)}
    dict_path = {
        (r.point_id, r.pid)
        for r in points_in_polygons(pts, polys, id_col="pid").collect()
    }
    monkeypatch.setattr(geo, "BROADCAST_DICT_MAX_ROWS", 2)
    row_path = {
        (r.point_id, r.pid)
        for r in points_in_polygons(pts, polys, id_col="pid").collect()
    }
    assert dict_path == row_path == expect

    over = polygon_overlap_pairs(
        _rects(spark, [(1, 0.0, 0.0, 2.0, 2.0), (2, 1.0, 1.0, 2.0, 2.0),
                       (3, 9.0, 9.0, 1.0, 1.0)]),
        "pid",
    ).collect()
    assert {(r.id_a, r.id_b) for r in over} == {(1, 2)}
