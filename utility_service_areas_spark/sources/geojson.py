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
    IntegerType,
    StringType,
    StructField,
    StructType,
)

GEOJSON_ROW_SCHEMA = StructType(
    [
        StructField("feature_idx", StringType()),
        # polygon position WITHIN its feature's MultiPolygon — carries
        # the source order through shuffles so a consumer can
        # reassemble the MultiPolygon byte-identically
        StructField("poly_idx", IntegerType()),
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
                    if gtype not in ("Polygon", "MultiPolygon"):
                        polys = []
                    for pi, poly in enumerate(polys):
                        out.append(
                            {
                                "feature_idx": str(i),
                                "poly_idx": pi,
                                "properties_json": json.dumps(
                                    feat.get("properties", {}), sort_keys=True
                                ),
                                "geom_type": gtype,
                                "geometry": poly,
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "feature_idx",
                    "poly_idx",
                    "properties_json",
                    "geom_type",
                    "geometry",
                ],
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


_LEAFLET_HTML_HEAD = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<meta name="viewport" content="width=device-width, initial-scale=1.0"/>
<title>{title}</title>
<link rel="stylesheet"
      href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>
  html, body {{ margin: 0; height: 100%; }}
  #map {{ height: 100%; }}
  .legend {{ background: white; padding: 6px 10px; border-radius: 4px;
             box-shadow: 0 1px 4px rgba(0,0,0,.3); font: 13px sans-serif; }}
  #sidebar {{ position: absolute; top: 0; right: 0; bottom: 0; width: 230px;
             max-width: 40%; overflow-y: auto; background: white; z-index: 1000;
             box-shadow: -1px 0 4px rgba(0,0,0,.3); font: 13px sans-serif;
             padding: 8px 12px; display: none; }}
  #sidebar h3 {{ margin: 4px 0 8px; font-size: 14px; }}
  #sidebar li {{ cursor: pointer; color: #0645ad; margin: 2px 0;
                list-style: none; }}
  #sidebar li:hover {{ text-decoration: underline; }}
  #sidebar ul {{ padding-left: 4px; margin: 0; }}
  #sidebar button {{ margin-top: 10px; }}
</style>
</head>
<body>
<div id="map"></div>
<div id="sidebar"></div>
<script>
const areas = """

_LEAFLET_HTML_TAIL = """;
const map = L.map('map');
// Base layers (parity: index.qmd's OSM / ESRI topo / imagery trio);
// only OSM starts enabled, the rest are picked from the layers control.
const osm = L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png', {
  maxZoom: 19,
  attribution: '&copy; OpenStreetMap contributors',
}).addTo(map);
const esriTopo = L.tileLayer(
  'https://server.arcgisonline.com/ArcGIS/rest/services/World_Topo_Map/MapServer/tile/{z}/{y}/{x}',
  { maxZoom: 19, attribution: 'Tiles &copy; Esri' });
const esriImagery = L.tileLayer(
  'https://server.arcgisonline.com/ArcGIS/rest/services/World_Imagery/MapServer/tile/{z}/{y}/{x}',
  { maxZoom: 19, attribution: 'Tiles &copy; Esri' });
// deterministic per-feature hue from the first property value
function hue(s) {
  let h = 0;
  for (let i = 0; i < s.length; i++) h = (h * 31 + s.charCodeAt(i)) >>> 0;
  return h % 360;
}
// Popup content is built via DOM nodes + textContent (never raw HTML
// markup): property values come from untrusted KML/HTML fetches.
function popupTable(props) {
  const table = document.createElement('table');
  for (const [k, v] of Object.entries(props)) {
    const tr = table.insertRow();
    const th = document.createElement('b');
    th.textContent = k;
    tr.insertCell().appendChild(th);
    tr.insertCell().textContent = v === null ? '' : String(v);
  }
  return table;
}
// Community-pin sidebar (parity: index.qmd:169-189 + its in-code TODO
// — 'show list of communities within service area ... clicking the
// name zooms the map to that city', plus the reset-view button). Pins
// are INLINED at export time (self-contained file, no runtime fetch);
// names go through textContent, never raw-HTML assignment.
const communities = COMMUNITIES_JSON;
const pinLayer = L.layerGroup(communities.map(c =>
  L.circleMarker([c.lat, c.lon], {
    radius: 4, stroke: false, fillOpacity: 0.75, color: '#000',
  }).bindTooltip(c.name)));
const styleBase = f => {
  const key = JSON.stringify(Object.values(f.properties)[0] ?? '');
  return { color: `hsl(${hue(key)},70%,40%)`, weight: 1, fillOpacity: 0.35 };
};
let clicked = null;
let homeBounds = null;
function showSidebar(feature, layerBounds) {
  const bar = document.getElementById('sidebar');
  bar.textContent = '';
  const h = document.createElement('h3');
  h.textContent = String(Object.values(feature.properties)[0] ?? 'area');
  bar.appendChild(h);
  const inArea = communities.filter(c =>
    layerBounds.contains(L.latLng(c.lat, c.lon)));
  const label = document.createElement('div');
  label.textContent = inArea.length
    ? `${inArea.length} communities in view bounds:` : 'No community pins in bounds.';
  bar.appendChild(label);
  const ul = document.createElement('ul');
  for (const c of inArea) {
    const li = document.createElement('li');
    li.textContent = c.name;
    li.onclick = () => map.flyTo([c.lat, c.lon], 10, { duration: 0.4 });
    ul.appendChild(li);
  }
  bar.appendChild(ul);
  const reset = document.createElement('button');
  reset.textContent = 'Reset view';
  reset.onclick = () => {
    if (clicked) clicked.setStyle(styleBase(clicked.feature));
    clicked = null;
    bar.style.display = 'none';
    if (homeBounds) map.fitBounds(homeBounds);
  };
  bar.appendChild(reset);
  bar.style.display = 'block';
}
const layer = L.geoJSON(areas, {
  style: styleBase,
  onEachFeature: (f, l) => {
    l.bindPopup(popupTable(f.properties));
    l.on('click', () => {
      if (clicked && clicked !== l) clicked.setStyle(styleBase(clicked.feature));
      l.setStyle({ color: '#FF0000', weight: 2, fillOpacity: 0.35 });
      clicked = l;
      map.flyToBounds(l.getBounds(), { duration: 0.4 });
      if (communities.length) showSidebar(f, l.getBounds());
    });
  },
}).addTo(map);
const overlays = { 'Service areas': layer };
if (communities.length) {
  overlays['Communities'] = pinLayer;
  pinLayer.addTo(map);
}
L.control.layers(
  { OpenStreetMap: osm, 'ESRI Topo': esriTopo, 'ESRI Imagery': esriImagery },
  overlays
).addTo(map);
L.control.scale({ maxWidth: 200 }).addTo(map);
if (layer.getBounds().isValid()) {
  homeBounds = layer.getBounds();
  map.fitBounds(homeBounds);
}
</script>
</body>
</html>
"""


def _json_for_script(obj) -> str:
    """json.dumps safe for inlining inside a <script> block: '<' is
    escaped to \\u003c so a property value containing '</script>' (or
    an HTML comment opener) cannot terminate the script context —
    pipeline properties originate from untrusted KML/HTML fetches."""
    return json.dumps(obj, default=str).replace("<", "\\u003c")


def write_leaflet_map(
    df: DataFrame,
    out_path: str,
    geom_col: str = "geometry",
    multi: bool = False,
    title: str = "Utility service areas",
    communities: DataFrame | None = None,
) -> str:
    """Presentation sink: the reference's interactive service-area map
    (index.qmd leaflet output) as ONE self-contained HTML file — the
    FeatureCollection is inlined, leaflet/OSM tiles load from their
    public CDNs at VIEW time, so building the file needs no network
    and no extra libraries.

    Every non-geometry column becomes a popup property; polygon color
    derives deterministically from the first property (certificate
    number in the reference layer). Streams features through
    toLocalIterator like write_geojson — the deliberate driver-side
    funnel at the very end of a pipeline, on the dim-sized exported
    layer only.
    """
    prop_cols = [c for c in df.columns if c != geom_col]
    import html as _html

    # Community pins (index.qmd:169-189 parity + its TODO sidebar): a
    # tiny (name, lat, lon) dim collected at the driver and INLINED —
    # the exported file stays self-contained (the reference fetches a
    # CSV at view time; here the pipeline ships the data with the map).
    pins = []
    if communities is not None:
        pins = [
            {"name": str(r["name"]), "lat": float(r["lat"]), "lon": float(r["lon"])}
            for r in communities.select("name", "lat", "lon").toLocalIterator()
        ]
    tail = _LEAFLET_HTML_TAIL.replace("COMMUNITIES_JSON", _json_for_script(pins))

    with open(out_path, "w") as f:
        f.write(_LEAFLET_HTML_HEAD.format(title=_html.escape(title)))
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
            f.write(_json_for_script(feat))
            first = False
        f.write("\n]}")
        f.write(tail)
    return out_path
