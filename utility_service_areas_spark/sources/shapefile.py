"""Shapefile source: distributed read of ESRI .shp/.dbf pairs.

Parity: BASELINE's approach sentence names "DataFrame ops over
Parquet/shapefiles"; the reference itself ingests KML
(R/functions.R:177,460), so this closes the one named source format
with no implementation. Spark-first shape mirrors sources/kml.py:
`binaryFile` scan (each file one row, split across executors) →
`mapInPandas` binary parse → long-form rows; geometry and attributes
are parsed from the sibling .shp / .dbf files and equi-joined on
(file base, record number). At 100 TB of files the binaryFile scan
parallelizes by file; no driver-side loop.

Format knowledge is the public ESRI Shapefile Technical Description
(July 1998 whitepaper) and the dBase III .dbf layout. Only stdlib
`struct` is used. Supported shapes: Null (0), Point (1),
PolyLine (3), Polygon (5), MultiPoint (8) — the 2-D types the
reference's service-area geometries need. Geometry rides the same
``array<array<array<double>>>`` (parts → points → [x, y]) convention
as KML_SCHEMA, so every downstream geometry UDF applies unchanged.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8

_SHAPE_NAMES = {
    SHAPE_NULL: "null",
    SHAPE_POINT: "point",
    SHAPE_POLYLINE: "polyline",
    SHAPE_POLYGON: "polygon",
    SHAPE_MULTIPOINT: "multipoint",
}

SHP_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("recno", LongType()),
        StructField("shape_type", StringType()),
        StructField("geometry", ArrayType(ArrayType(ArrayType(DoubleType())))),
    ]
)

DBF_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("recno", LongType()),
        StructField("attrs", MapType(StringType(), StringType())),
    ]
)


# --------------------------------------------------------------------------
# writer (fixture builder + the sink half of the round-trip)
# --------------------------------------------------------------------------


def _flat_points(geometry: Sequence[Sequence[Sequence[float]]]) -> list[list[float]]:
    return [pt for part in geometry for pt in part]


def _bbox(points: list[list[float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return (min(xs), min(ys), max(xs), max(ys))


def _encode_record(shape_type: int, geometry) -> bytes:
    """Record CONTENT (after the 8-byte record header), little-endian
    per the spec: shape type, then the shape-specific body."""
    if shape_type == SHAPE_NULL:
        return struct.pack("<i", SHAPE_NULL)
    if shape_type == SHAPE_POINT:
        (x, y) = geometry[0][0][0], geometry[0][0][1]
        return struct.pack("<idd", SHAPE_POINT, x, y)
    pts = _flat_points(geometry)
    xmin, ymin, xmax, ymax = _bbox(pts)
    if shape_type == SHAPE_MULTIPOINT:
        body = struct.pack("<i4di", SHAPE_MULTIPOINT, xmin, ymin, xmax, ymax, len(pts))
        for x, y in pts:
            body += struct.pack("<dd", x, y)
        return body
    if shape_type in (SHAPE_POLYLINE, SHAPE_POLYGON):
        parts = list(geometry)
        offsets, off = [], 0
        for part in parts:
            offsets.append(off)
            off += len(part)
        body = struct.pack(
            "<i4dii", shape_type, xmin, ymin, xmax, ymax, len(parts), len(pts)
        )
        body += struct.pack(f"<{len(parts)}i", *offsets)
        for x, y in pts:
            body += struct.pack("<dd", x, y)
        return body
    raise ValueError(f"unsupported shape type {shape_type}")


def _dbf_field_bytes(value, ftype: str, length: int) -> bytes:
    if value is None:
        s = ""
    elif ftype == "L":
        s = "T" if value else "F"
    else:
        s = str(value)
    raw = s.encode("ascii", "replace")[:length]
    if ftype in ("N", "F"):
        return raw.rjust(length)  # numerics right-justified
    return raw.ljust(length)


def build_shapefile(
    records: Sequence[tuple[int, Sequence, dict]],
    fields: Sequence[tuple[str, str, int, int]],
) -> tuple[bytes, bytes, bytes]:
    """Build (shp, shx, dbf) byte blobs for ``records`` =
    [(shape_type, geometry, attrs)] and ``fields`` =
    [(name, type, length, decimals)] (dBase III descriptors). The
    fixture builder for round-trip tests AND the encode half of the
    registered round-trip query — kept with the parser so the two
    sides share one understanding of the spec."""
    contents = [_encode_record(st, geom) for st, geom, _ in records]
    all_pts = [p for st, geom, _ in records if st != SHAPE_NULL for p in _flat_points(geom)]
    xmin, ymin, xmax, ymax = _bbox(all_pts) if all_pts else (0.0, 0.0, 0.0, 0.0)
    shape_type = next((st for st, _, _ in records if st != SHAPE_NULL), SHAPE_NULL)

    def header(total_len_bytes: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", total_len_bytes // 2)  # length in 16-bit words
        h += struct.pack("<ii", 1000, shape_type)
        h += struct.pack("<4d", xmin, ymin, xmax, ymax)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z / m ranges unused
        return h

    shp = b""
    shx = b""
    offset = 100  # bytes; header precedes record 0
    for i, content in enumerate(contents):
        shp += struct.pack(">ii", i + 1, len(content) // 2) + content
        shx += struct.pack(">ii", offset // 2, len(content) // 2)
        offset += 8 + len(content)
    shp_blob = header(100 + len(shp)) + shp
    shx_blob = header(100 + len(shx)) + shx

    n = len(records)
    rec_size = 1 + sum(length for _, _, length, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = struct.pack("<B3BIHH", 0x03, 98, 1, 1, n, hdr_size, rec_size)
    dbf += b"\x00" * 20
    for name, ftype, length, dec in fields:
        dbf += (
            name.encode("ascii")[:11].ljust(11, b"\x00")
            + ftype.encode("ascii")
            + b"\x00" * 4
            + struct.pack("<BB", length, dec)
            + b"\x00" * 14
        )
    dbf += b"\x0d"
    for _, _, attrs in records:
        dbf += b"\x20"  # not deleted
        for name, ftype, length, _ in fields:
            dbf += _dbf_field_bytes(attrs.get(name), ftype, length)
    dbf += b"\x1a"
    return shp_blob, shx_blob, dbf


def write_shapefile(directory: str, base: str, records, fields) -> None:
    """Write base.shp / base.shx / base.dbf under ``directory`` (a
    local fixture writer for tests; a cluster sink would route the
    blobs through a foreachPartition file commit instead)."""
    shp, shx, dbf = build_shapefile(records, fields)
    for ext, blob in (("shp", shp), ("shx", shx), ("dbf", dbf)):
        with open(os.path.join(directory, f"{base}.{ext}"), "wb") as f:
            f.write(blob)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------


def parse_shp_bytes(path: str, blob: bytes) -> list[dict]:
    """One row per .shp record: (path, recno, shape_type, geometry).
    Geometry is parts → points → [x, y]; a Point becomes one
    single-point part, a MultiPoint one part with all points, a Null
    shape an empty list. Malformed trailing bytes stop the scan
    (never raise) — a truncated file yields its readable prefix, the
    posture every source in this package takes."""
    rows: list[dict] = []
    if len(blob) < 100 or struct.unpack(">i", blob[:4])[0] != 9994:
        return rows
    pos = 100
    while pos + 8 <= len(blob):
        recno, content_words = struct.unpack(">ii", blob[pos : pos + 8])
        content = blob[pos + 8 : pos + 8 + content_words * 2]
        pos += 8 + content_words * 2
        if len(content) < 4:
            break
        (stype,) = struct.unpack("<i", content[:4])
        try:
            geometry = _decode_content(stype, content)
        except struct.error:
            break
        rows.append(
            {
                "path": path,
                "recno": int(recno),
                "shape_type": _SHAPE_NAMES.get(stype, f"type_{stype}"),
                "geometry": geometry,
            }
        )
    return rows


def _decode_content(stype: int, content: bytes):
    if stype == SHAPE_NULL:
        return []
    if stype == SHAPE_POINT:
        x, y = struct.unpack("<dd", content[4:20])
        return [[[x, y]]]
    if stype == SHAPE_MULTIPOINT:
        (npts,) = struct.unpack("<i", content[36:40])
        pts = struct.unpack(f"<{2 * npts}d", content[40 : 40 + 16 * npts])
        return [[[pts[2 * i], pts[2 * i + 1]] for i in range(npts)]]
    if stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
        nparts, npts = struct.unpack("<ii", content[36:44])
        offsets = list(struct.unpack(f"<{nparts}i", content[44 : 44 + 4 * nparts]))
        pt_base = 44 + 4 * nparts
        pts = struct.unpack(f"<{2 * npts}d", content[pt_base : pt_base + 16 * npts])
        bounds = offsets + [npts]
        return [
            [[pts[2 * i], pts[2 * i + 1]] for i in range(bounds[j], bounds[j + 1])]
            for j in range(nparts)
        ]
    raise struct.error(f"unsupported shape type {stype}")


def parse_dbf_bytes(path: str, blob: bytes) -> list[dict]:
    """One row per .dbf record: (path, recno, attrs map). Field values
    are stripped strings (numeric parsing is the caller's cast — the
    map keeps the source faithful and the schema stable across
    heterogeneous .dbf layouts). recno is 1-based to match .shp."""
    rows: list[dict] = []
    if len(blob) < 33 or blob[0] not in (0x03, 0x83):
        return rows
    n_rec, hdr_size, rec_size = struct.unpack("<IHH", blob[4:12])
    fields = []
    pos = 32
    while pos + 32 <= hdr_size - 1 and blob[pos] != 0x0D:
        name = blob[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(blob[pos + 11])
        length = blob[pos + 16]
        fields.append((name, ftype, length))
        pos += 32
    base = hdr_size
    for i in range(n_rec):
        rec = blob[base + i * rec_size : base + (i + 1) * rec_size]
        if len(rec) < rec_size:
            # Truncated file (or a corrupt header over-claiming n_rec,
            # which is read from untrusted bytes and may claim up to
            # 2^32 records): no later record can be complete either,
            # so STOP at the readable prefix — the same posture as
            # parse_shp_bytes — instead of spinning through billions
            # of empty slices (ADVICE r9).
            break
        if rec[0] == 0x2A:  # deleted-record flag
            continue
        attrs, off = {}, 1
        for name, _ftype, length in fields:
            attrs[name] = rec[off : off + length].decode("ascii", "replace").strip()
            off += length
        rows.append({"path": path, "recno": i + 1, "attrs": attrs})
    return rows


# --------------------------------------------------------------------------
# distributed readers
# --------------------------------------------------------------------------


def _map_parser(parse_fn, schema_cols):
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                out.extend(parse_fn(row["path"], row["content"]))
            yield pd.DataFrame(out, columns=schema_cols)

    return parse


def read_shp(spark: SparkSession, directory: str) -> DataFrame:
    """Geometry side only: (path, recno, shape_type, geometry)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.shp")
        .load(directory)
    )
    return binary.select("path", "content").mapInPandas(
        _map_parser(parse_shp_bytes, [f.name for f in SHP_SCHEMA.fields]), SHP_SCHEMA
    )


def read_dbf(spark: SparkSession, directory: str) -> DataFrame:
    """Attribute side only: (path, recno, attrs)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dbf")
        .load(directory)
    )
    return binary.select("path", "content").mapInPandas(
        _map_parser(parse_dbf_bytes, [f.name for f in DBF_SCHEMA.fields]), DBF_SCHEMA
    )


def read_shapefile(spark: SparkSession, directory: str) -> DataFrame:
    """Full shapefile read: geometry equi-joined with its .dbf
    attributes on (file base, record number) — two binaryFile scans,
    two map-side parses, one hash join keyed by (base, recno); no
    driver-side file loop, so a directory of a million shapefiles
    parallelizes by file. Returns
    (base, recno, shape_type, geometry, attrs)."""
    strip = lambda c: F.regexp_replace(F.col(c), r"\.(shp|dbf)$", "")  # noqa: E731
    geo = read_shp(spark, directory).withColumn("base", strip("path")).drop("path")
    attrs = read_dbf(spark, directory).withColumn("base", strip("path")).drop("path")
    return geo.join(attrs, ["base", "recno"], "left").select(
        "base", "recno", "shape_type", "geometry", "attrs"
    )
