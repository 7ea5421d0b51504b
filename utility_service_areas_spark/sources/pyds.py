"""Spark 4 Python DataSource connector for ESRI shapefiles.

`spark.read.format("shapefile").load(dir)` — the same pure-stdlib
parse kernels as sources/shapefile.py (parse_shp_bytes /
parse_dbf_bytes; ESRI whitepaper + dBase III layouts), packaged as a
first-class `pyspark.sql.datasource.DataSource` instead of a
binaryFile+mapInPandas composition. What the connector form adds over
the composition (reference parity: the reference shells out to
st_read/GDAL per file — utility-service-areas R/functions.R:177 —
while this stays in-engine):

- **file-level partition planning**: `partitions()` returns one
  InputPartition per shapefile BASE (the .shp/.dbf pair), so a
  directory of a million shapefiles parallelizes by file with the
  geometry⋈attrs join done LOCALLY inside each task — the
  composition's (base, recno) hash join disappears entirely.
- driver does listing only (a FileIndex's job); bytes are read and
  parsed executor-side.
- the reader is engine-registered, so `.format("shapefile")` works
  anywhere a format string does.

Scale note: one partition per file pair is the right granularity for
the many-small-files reality of shapefile corpora (the format caps a
single .shp at 2 GB anyway); a giant outlier file splits no worse
than binaryFile, which is also whole-file.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from utility_service_areas_spark.sources.shapefile import (
    DBF_SCHEMA,
    SHP_SCHEMA,
    parse_dbf_bytes,
    parse_shp_bytes,
)

def _ds_schema() -> StructType:
    # (base, recno, shape_type, geometry, attrs) — the composition
    # reader's output shape (sources/shapefile.py:read_shapefile).
    s = StructType()
    s = s.add("base", "string")
    s = s.add(SHP_SCHEMA["recno"])
    s = s.add(SHP_SCHEMA["shape_type"])
    s = s.add(SHP_SCHEMA["geometry"])
    s = s.add(DBF_SCHEMA["attrs"])
    return s


SHAPEFILE_DS_SCHEMA = _ds_schema()


class ShapefilePartition(InputPartition):
    def __init__(self, base: str):
        self.base = base  # path without extension; .shp/.dbf appended


class ShapefileReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("shapefile source requires a path: .load(dir)")
        self._path = path

    def partitions(self):  # driver-side listing only
        bases = sorted(
            os.path.join(self._path, f[:-4])
            for f in os.listdir(self._path)
            if f.endswith(".shp")
        )
        if not bases:
            raise FileNotFoundError(f"no .shp files under {self._path!r}")
        return [ShapefilePartition(b) for b in bases]

    def read(self, partition: ShapefilePartition):
        # Executor-side: parse the pair with the SAME kernels as the
        # mapInPandas composition, join geometry⋈attrs locally on
        # recno (no shuffle — the pair is one task by construction).
        base = partition.base
        with open(base + ".shp", "rb") as f:
            geo = parse_shp_bytes(base + ".shp", f.read())
        attrs_by_recno: dict[int, dict] = {}
        dbf = base + ".dbf"
        if os.path.exists(dbf):
            with open(dbf, "rb") as f:
                for rec in parse_dbf_bytes(dbf, f.read()):
                    attrs_by_recno[rec["recno"]] = rec["attrs"]
        for rec in geo:
            yield (
                base,
                rec["recno"],
                rec["shape_type"],
                rec["geometry"],
                attrs_by_recno.get(rec["recno"]),
            )


class ShapefileDataSource(DataSource):
    """`spark.dataSource.register(ShapefileDataSource)` once per
    session (session.py does it), then
    `spark.read.format("shapefile").load(dir)`."""

    @classmethod
    def name(cls) -> str:
        return "shapefile"

    def schema(self) -> StructType:
        return SHAPEFILE_DS_SCHEMA

    def reader(self, schema: StructType) -> ShapefileReader:
        return ShapefileReader(self.options)
