"""KML source: distributed read of KML placemark polygons.

Parity: st_read of RCA service-area KMLs (reference
R/functions.R:177,460). Spark-first shape: `binaryFile` scan (each
file is one row, split across executors) → `mapInPandas` XML parse →
long-form (file, name, description, geometry) rows. At 100 TB of
files the binaryFile scan parallelizes by file; no driver-side loop.

Only stdlib xml.etree is used (no lxml in the environment).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

KML_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("placemark_name", StringType()),
        StructField("description", StringType()),
        StructField("geometry", ArrayType(ArrayType(ArrayType(DoubleType())))),
    ]
)

_NS_RE = re.compile(r"\{.*\}")


def _local(tag: str) -> str:
    return _NS_RE.sub("", tag)


def _parse_coords(text: str) -> list[list[float]]:
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append([float(parts[0]), float(parts[1])])  # lon, lat (drop alt)
    return pts


def _polygons_of(elem) -> list[list[list[list[float]]]]:
    """All Polygon geometries under elem (handles MultiGeometry)."""
    polys = []
    for node in elem.iter():
        if _local(node.tag) != "Polygon":
            continue
        rings = []
        for bound in node:
            kind = _local(bound.tag)
            if kind not in ("outerBoundaryIs", "innerBoundaryIs"):
                continue
            for lr in bound.iter():
                if _local(lr.tag) == "coordinates":
                    ring = _parse_coords(lr.text)
                    if ring:
                        # outer ring first
                        if kind == "outerBoundaryIs":
                            rings.insert(0, ring)
                        else:
                            rings.append(ring)
        if rings:
            polys.append(rings)
    return polys


def parse_kml_bytes(path: str, blob: bytes) -> list[dict]:
    """One row per Placemark polygon (a MultiGeometry placemark yields
    several rows; downstream group-by-key + st_combine collapses them,
    mirroring the reference's bind_rows + group_by flow)."""
    rows = []
    try:
        root = ET.fromstring(blob)
    except ET.ParseError:
        return rows
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = desc = None
        for child in pm:
            if _local(child.tag) == "name":
                name = (child.text or "").strip()
            elif _local(child.tag) == "description":
                desc = (child.text or "").strip()
        for poly in _polygons_of(pm):
            rows.append(
                {
                    "path": path,
                    "placemark_name": name,
                    "description": desc,
                    "geometry": poly,
                }
            )
    return rows


def read_kml(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed KML read: (path, placemark_name, description, geometry)."""
    binary = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                out.extend(parse_kml_bytes(row["path"], row["content"]))
            yield pd.DataFrame(
                out, columns=["path", "placemark_name", "description", "geometry"]
            )

    return binary.select("path", "content").mapInPandas(parse, KML_SCHEMA)


def local_kml_glob(directory: str) -> str:
    return os.path.join(directory, "*.kml")
