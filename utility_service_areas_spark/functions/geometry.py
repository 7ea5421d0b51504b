"""Pure-Python planar geometry library + Arrow-batched Spark UDFs.

The execution environment has no shapely/GEOS, so this module supplies
the `sf`-equivalent primitives the reference pipeline needs
(st_area/st_bbox/centroid/st_make_valid/st_intersects/point-in-polygon,
reference R/functions.R:182,184,406,431,468,471) over a GeoJSON-style
representation:

    polygon  = list[ring],  ring = list[[x, y]]   (first ring = outer)
    Spark type: array<array<array<double>>>

Scale posture: these run as pandas UDFs (Arrow batch transfer, one
Python call per batch, not per row) and are always preceded by a
JVM-side bbox prefilter so the Python inner loop only sees candidate
pairs, never the raw cross product.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StructField,
    StructType,
)

Ring = list  # list[[x, y]]
Polygon = list  # list[Ring]

POLYGON_DTYPE = ArrayType(ArrayType(ArrayType(DoubleType())))
BBOX_DTYPE = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)


# ---------------------------------------------------------------- core


def ring_area_signed(ring: Ring) -> float:
    """Shoelace formula; positive for counter-clockwise rings."""
    s = 0.0
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def polygon_area(poly: Polygon) -> float:
    """|outer| minus hole areas (st_area semantics, planar)."""
    if poly is None or len(poly) == 0:
        return 0.0
    area = abs(ring_area_signed(poly[0]))
    for hole in poly[1:]:
        area -= abs(ring_area_signed(hole))
    return area


def polygon_centroid(poly: Polygon) -> tuple[float, float]:
    """Area-weighted centroid of the outer ring."""
    ring = poly[0]
    a = ring_area_signed(ring)
    if a == 0:
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        return sum(xs) / len(xs), sum(ys) / len(ys)
    cx = cy = 0.0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        cross = x1 * y2 - x2 * y1
        cx += (x1 + x2) * cross
        cy += (y1 + y2) * cross
    return cx / (6 * a), cy / (6 * a)


def polygon_bbox(poly: Polygon) -> tuple[float, float, float, float]:
    xs = [p[0] for ring in poly for p in ring]
    ys = [p[1] for ring in poly for p in ring]
    return min(xs), min(ys), max(xs), max(ys)


def point_in_ring(x: float, y: float, ring: Ring) -> bool:
    """Ray casting; boundary behavior is half-open (callers that need
    exact edge semantics should prefilter with bbox epsilon)."""
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        if (y1 > y) != (y2 > y):
            x_cross = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < x_cross:
                inside = not inside
    return inside


def point_in_polygon(x: float, y: float, poly: Polygon) -> bool:
    if poly is None or len(poly) == 0 or not point_in_ring(x, y, poly[0]):
        return False
    return not any(point_in_ring(x, y, hole) for hole in poly[1:])


def _orient(ax, ay, bx, by, cx, cy) -> int:
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return 0 if v == 0 else (1 if v > 0 else -1)


def _on_seg(ax, ay, bx, by, px, py) -> bool:
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def segments_intersect(p1, p2, p3, p4) -> bool:
    o1 = _orient(*p1, *p2, *p3)
    o2 = _orient(*p1, *p2, *p4)
    o3 = _orient(*p3, *p4, *p1)
    o4 = _orient(*p3, *p4, *p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_seg(*p1, *p2, *p3):
        return True
    if o2 == 0 and _on_seg(*p1, *p2, *p4):
        return True
    if o3 == 0 and _on_seg(*p3, *p4, *p1):
        return True
    return o4 == 0 and _on_seg(*p3, *p4, *p2)


def polygons_intersect(a: Polygon, b: Polygon) -> bool:
    """st_intersects for simple polygons: bbox reject, then edge
    crossings, then mutual containment."""
    ax0, ay0, ax1, ay1 = polygon_bbox(a)
    bx0, by0, bx1, by1 = polygon_bbox(b)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return False
    ra, rb = a[0], b[0]
    for i in range(len(ra) - 1):
        for j in range(len(rb) - 1):
            if segments_intersect(
                (ra[i][0], ra[i][1]),
                (ra[i + 1][0], ra[i + 1][1]),
                (rb[j][0], rb[j][1]),
                (rb[j + 1][0], rb[j + 1][1]),
            ):
                return True
    return point_in_polygon(ra[0][0], ra[0][1], b) or point_in_polygon(
        rb[0][0], rb[0][1], a
    )


def make_valid(poly: Polygon) -> Polygon:
    """st_make_valid-lite (reference R/functions.R:182,468): drop
    consecutive duplicate vertices, close unclosed rings, drop
    degenerate rings, orient outer CCW and holes CW. Idempotent.
    """
    fixed: Polygon = []
    for idx, ring in enumerate(poly):
        pts = []
        for p in ring:
            if len(pts) == 0 or (p[0], p[1]) != (pts[-1][0], pts[-1][1]):
                pts.append([float(p[0]), float(p[1])])
        if len(pts) >= 2 and (pts[0][0], pts[0][1]) == (pts[-1][0], pts[-1][1]):
            pts.pop()
        if len(pts) < 3:
            continue
        pts.append([pts[0][0], pts[0][1]])  # close
        signed = ring_area_signed(pts)
        if signed == 0:
            continue
        want_ccw = idx == 0
        if (signed > 0) != want_ccw:
            pts = pts[::-1]
        fixed.append(pts)
    return fixed


def rect_polygon(x0: float, y0: float, w: float, h: float) -> Polygon:
    """Axis-aligned rectangle as a closed CCW polygon."""
    return [
        [
            [x0, y0],
            [x0 + w, y0],
            [x0 + w, y0 + h],
            [x0, y0 + h],
            [x0, y0],
        ]
    ]


# ------------------------------------------------------------- PLSS

# PLSS cell code, e.g. 'S009N067W05' (reference _targets.R:212-233):
# meridian letter, 3-digit township + N/S, 3-digit range + E/W,
# 2-digit section (1..36, boustrophedon from the NE corner).
# Planar model: the meridian origin is (0,0); townships are 6x6-mile
# squares; a section is the 1x1-mile cell inside.

MERIDIAN_OFFSETS = {"S": (0.0, 0.0), "K": (600.0, 0.0), "F": (0.0, 600.0), "U": (600.0, 600.0)}


def parse_plss_code(code: str) -> tuple[str, int, str, int, str, int]:
    m = code[0]
    twp = int(code[1:4])
    twp_dir = code[4]
    rng = int(code[5:8])
    rng_dir = code[8]
    sec = int(code[9:11])
    return m, twp, twp_dir, rng, rng_dir, sec


def plss_cell_rect(code: str) -> Polygon:
    """Section cell → 1x1-mile rectangle polygon in the planar model."""
    m, twp, twp_dir, rng, rng_dir, sec = parse_plss_code(code)
    mx, my = MERIDIAN_OFFSETS.get(m, (0.0, 0.0))
    ty = (twp - 1) * 6.0 if twp_dir == "N" else -twp * 6.0
    rx = (rng - 1) * 6.0 if rng_dir == "E" else -rng * 6.0
    # Section 1 is the NE corner; rows snake west-east (boustrophedon).
    row = (sec - 1) // 6  # 0 = north row
    pos = (sec - 1) % 6
    col = 5 - pos if row % 2 == 0 else pos  # from west edge
    x0 = mx + rx + col * 1.0
    y0 = my + ty + (5 - row) * 1.0
    return rect_polygon(x0, y0, 1.0, 1.0)


# --------------------------------------------------------- Spark UDFs


@F.pandas_udf(DoubleType())
def st_area(polys: pd.Series) -> pd.Series:
    return polys.map(lambda p: polygon_area(p) if p is not None else None)


@F.pandas_udf(BBOX_DTYPE)
def st_bbox(polys: pd.Series) -> pd.DataFrame:
    out = {"xmin": [], "ymin": [], "xmax": [], "ymax": []}
    for p in polys:
        if p is None or not len(p):
            vals = (None, None, None, None)
        else:
            vals = polygon_bbox(p)
        for k, v in zip(out, vals):
            out[k].append(v)
    return pd.DataFrame(out)


@F.pandas_udf(
    StructType([StructField("cx", DoubleType()), StructField("cy", DoubleType())])
)
def st_centroid(polys: pd.Series) -> pd.DataFrame:
    cx, cy = [], []
    for p in polys:
        if p is None or not len(p):
            cx.append(None)
            cy.append(None)
        else:
            x, y = polygon_centroid(p)
            cx.append(x)
            cy.append(y)
    return pd.DataFrame({"cx": cx, "cy": cy})


@F.pandas_udf(BooleanType())
def st_contains_point(polys: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    return pd.Series(
        [
            point_in_polygon(float(x), float(y), p) if p is not None else False
            for p, x, y in zip(polys, xs, ys)
        ]
    )


@F.pandas_udf(BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            polygons_intersect(pa, pb) if pa is not None and pb is not None else False
            for pa, pb in zip(a, b)
        ]
    )


@F.pandas_udf(POLYGON_DTYPE)
def st_make_valid(polys: pd.Series) -> pd.Series:
    return polys.map(lambda p: make_valid(p) if p is not None else None)


@F.pandas_udf(POLYGON_DTYPE)
def st_plss_cell(codes: pd.Series) -> pd.Series:
    return codes.map(plss_cell_rect)


@F.pandas_udf(DoubleType())
def st_area_multi(multis: pd.Series) -> pd.Series:
    """Area of a MultiPolygon (array of polygons) — st_combine + st_area."""
    return multis.map(
        lambda mp: sum(polygon_area(p) for p in mp) if mp is not None else None
    )
