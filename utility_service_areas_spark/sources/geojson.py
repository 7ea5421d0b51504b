"""GeoJSON source/sink.

Parity: st_write / st_read of the merged service-area layer
(reference R/functions.R:166-171,559). The reader is distributed
(binaryFile → mapInPandas feature explode). The writer is an explicit
export sink: it streams partitions through `toLocalIterator` — the
single output file is the contract (one GeoJSON FeatureCollection),
so this is the one deliberate driver-side funnel in the engine, used
only at the very end of a pipeline.
"""

from __future__ import annotations

import json
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

GEOJSON_ROW_SCHEMA = StructType(
    [
        StructField("feature_idx", StringType()),
        StructField("properties_json", StringType()),
        StructField("geom_type", StringType()),
        StructField("geometry", ArrayType(ArrayType(ArrayType(DoubleType())))),
    ]
)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection → one row per feature (Polygon or MultiPolygon
    flattened to polygons; properties kept as a JSON string for
    schema-free round-tripping, parse with F.from_json downstream)."""
    binary = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                fc = json.loads(row["content"])
                for i, feat in enumerate(fc.get("features", [])):
                    geom = feat.get("geometry") or {}
                    gtype = geom.get("type")
                    coords = geom.get("coordinates", [])
                    polys = [coords] if gtype == "Polygon" else coords
                    for poly in polys if gtype in ("Polygon", "MultiPolygon") else []:
                        out.append(
                            {
                                "feature_idx": str(i),
                                "properties_json": json.dumps(
                                    feat.get("properties", {}), sort_keys=True
                                ),
                                "geom_type": gtype,
                                "geometry": poly,
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=["feature_idx", "properties_json", "geom_type", "geometry"],
            )

    return binary.select("path", "content").mapInPandas(parse, GEOJSON_ROW_SCHEMA)


def write_geojson(
    df: DataFrame, out_path: str, geom_col: str = "geometry", multi: bool = False
) -> str:
    """Export sink: rows → FeatureCollection. ``geom_col`` holds a
    polygon (or a MultiPolygon when ``multi``); every other column
    becomes a feature property. Streams via toLocalIterator (never
    a full collect into one list)."""
    prop_cols = [c for c in df.columns if c != geom_col]
    with open(out_path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        first = True
        for row in df.toLocalIterator():
            d = row.asDict(recursive=True)
            geom = d.pop(geom_col)
            feat = {
                "type": "Feature",
                "properties": {k: d[k] for k in prop_cols},
                "geometry": {
                    "type": "MultiPolygon" if multi else "Polygon",
                    "coordinates": geom,
                },
            }
            if not first:
                f.write(",\n")
            f.write(json.dumps(feat, default=str))
            first = False
        f.write("\n]}\n")
    return out_path
