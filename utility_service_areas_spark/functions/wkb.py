"""Packed-binary geometry codec (WKB-flavored).

Why: the engine's geometry columns are nested arrays
(array<array<array<double>>>), which Arrow transfers as four levels of
offset buffers — fine, but a single BINARY column moves as ONE
contiguous buffer per batch and is the format a catalog would store
(GeoParquet stores WKB). This codec packs a polygon into a flat
little-endian layout:

    uint32 n_rings | per ring: uint32 n_pts | n_pts * (f64 x, f64 y)

so geometry can be carried through shuffles/storage as bytes and only
expanded where a kernel needs coordinates. Kernels that reduce
geometry to scalars (area here) read the buffer directly via numpy —
no nested-list materialization at all.

Pure numpy; byte-exact roundtrip (f64 bits preserved).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType

from utility_service_areas_spark.functions.geometry import (
    POLYGON_DTYPE,
    _c,
    _sentinel_poly,
    ring_area_signed,
)


def encode_polygon(poly) -> bytes | None:
    """Polygon (list of rings of [x, y]) → packed bytes."""
    if poly is None:
        return None
    parts = [np.asarray([len(poly)], dtype="<u4").tobytes()]
    for ring in poly:
        # Arrow batches arrive as object arrays of per-point ndarrays;
        # vstack normalizes both those and plain nested lists.
        arr = np.vstack([np.asarray(p, dtype="<f8") for p in ring])
        parts.append(np.asarray([arr.shape[0]], dtype="<u4").tobytes())
        parts.append(arr.astype("<f8").tobytes())
    return b"".join(parts)


def decode_polygon(buf: bytes | None):
    """Packed bytes → polygon as nested lists (inverse of encode)."""
    if buf is None:
        return None
    n_rings = int(np.frombuffer(buf, dtype="<u4", count=1)[0])
    off = 4
    rings = []
    for _ in range(n_rings):
        n_pts = int(np.frombuffer(buf, dtype="<u4", count=1, offset=off)[0])
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=off)
        off += 16 * n_pts
        rings.append(pts.reshape(n_pts, 2).tolist())
    return rings


def wkb_area(buf: bytes | None) -> float | None:
    """Shoelace area straight off the packed buffer (outer ring minus
    holes), no nested-list construction."""
    if buf is None:
        return None
    n_rings = int(np.frombuffer(buf, dtype="<u4", count=1)[0])
    off = 4
    total = 0.0
    for idx in range(n_rings):
        n_pts = int(np.frombuffer(buf, dtype="<u4", count=1, offset=off)[0])
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=off).reshape(
            n_pts, 2
        )
        off += 16 * n_pts
        x, y = pts[:, 0], pts[:, 1]
        signed = 0.5 * float(
            np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
        )
        a = abs(signed)
        total += a if idx == 0 else -a
    return total


@F.pandas_udf(BinaryType())
def _st_as_wkb_raw(polys: pd.Series) -> pd.Series:
    return polys.map(
        lambda p: encode_polygon(p) if p is not None and len(p) else None
    )


def st_as_wkb(poly) -> F.Column:
    poly = _c(poly)
    return F.when(
        poly.isNotNull(), _st_as_wkb_raw(F.coalesce(poly, _sentinel_poly()))
    )


@F.pandas_udf(POLYGON_DTYPE)
def _st_from_wkb_raw(bufs: pd.Series) -> pd.Series:
    # binary input: the all-null Arrow hazard only affects nested arrays
    return bufs.map(decode_polygon)


def st_from_wkb(buf) -> F.Column:
    return _st_from_wkb_raw(_c(buf))


@F.pandas_udf(DoubleType())
def st_area_wkb(bufs: pd.Series) -> pd.Series:
    return bufs.map(wkb_area)


__all__ = [
    "encode_polygon",
    "decode_polygon",
    "wkb_area",
    "st_as_wkb",
    "st_from_wkb",
    "st_area_wkb",
    "ring_area_signed",
]
