"""Shapefile source (S17): write real .shp/.shx/.dbf fixtures with the
package's own builder, read them back through the DISTRIBUTED reader
(binaryFile → mapInPandas → (base, recno) join), and assert exact
geometry + attribute round trips, including multi-part shapes, every
supported shape type, deleted .dbf rows, and truncated files.
"""

from __future__ import annotations

import struct
import time

import pytest

from utility_service_areas_spark.sources.shapefile import (
    SHAPE_MULTIPOINT,
    SHAPE_NULL,
    SHAPE_POINT,
    SHAPE_POLYGON,
    SHAPE_POLYLINE,
    build_shapefile,
    parse_dbf_bytes,
    parse_shp_bytes,
    read_shapefile,
    write_shapefile,
)

FIELDS = [("NAME", "C", 16, 0), ("KEY", "N", 8, 0), ("ACTIVE", "L", 1, 0)]

# A polygon with a hole, a 2-part polyline, a point, a multipoint, and
# a null shape — every supported type in one file.
RECORDS = [
    (
        SHAPE_POLYGON,
        [
            [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]],
            [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]],
        ],
        {"NAME": "poly_hole", "KEY": 1, "ACTIVE": True},
    ),
    (
        SHAPE_POLYLINE,
        [[[0.0, 0.0], [1.5, 2.5]], [[3.0, 3.0], [4.0, 5.0], [6.0, 1.0]]],
        {"NAME": "two_part_line", "KEY": 2, "ACTIVE": False},
    ),
    (SHAPE_POINT, [[[7.25, -3.5]]], {"NAME": "pt", "KEY": 3, "ACTIVE": True}),
    (
        SHAPE_MULTIPOINT,
        [[[1.0, 1.0], [2.0, 2.0], [3.0, 1.0]]],
        {"NAME": "mpt", "KEY": 4, "ACTIVE": True},
    ),
    (SHAPE_NULL, [], {"NAME": "nothing", "KEY": 5, "ACTIVE": False}),
]


def test_bytes_roundtrip_all_shape_types():
    shp, shx, dbf = build_shapefile(RECORDS, FIELDS)
    # header invariants (public ESRI layout)
    assert struct.unpack(">i", shp[:4])[0] == 9994
    assert struct.unpack("<i", shp[28:32])[0] == 1000
    assert struct.unpack(">i", shp[24:28])[0] * 2 == len(shp)
    assert len(shx) == 100 + 8 * len(RECORDS)

    geo = parse_shp_bytes("f.shp", shp)
    assert [g["recno"] for g in geo] == [1, 2, 3, 4, 5]
    assert [g["shape_type"] for g in geo] == [
        "polygon",
        "polyline",
        "point",
        "multipoint",
        "null",
    ]
    for got, (_, want_geom, _) in zip(geo, RECORDS):
        assert got["geometry"] == [list(map(list, part)) for part in want_geom]

    at = parse_dbf_bytes("f.dbf", dbf)
    assert len(at) == 5
    assert at[0]["attrs"] == {"NAME": "poly_hole", "KEY": "1", "ACTIVE": "T"}
    assert at[4]["attrs"]["ACTIVE"] == "F"


def test_deleted_dbf_row_is_skipped():
    _, _, dbf = build_shapefile(RECORDS[:2], FIELDS)
    hdr_size = struct.unpack("<H", dbf[8:10])[0]
    mutated = bytearray(dbf)
    mutated[hdr_size] = 0x2A  # mark record 1 deleted
    rows = parse_dbf_bytes("f.dbf", bytes(mutated))
    assert [r["recno"] for r in rows] == [2]


def test_truncated_shp_yields_readable_prefix():
    shp, _, _ = build_shapefile(RECORDS, FIELDS)
    # cut mid-way through record 3's content
    geo_full = parse_shp_bytes("f.shp", shp)
    assert len(geo_full) == 5
    cut = parse_shp_bytes("f.shp", shp[: len(shp) - 30])
    assert 0 < len(cut) < 5
    assert parse_shp_bytes("f.shp", b"not a shapefile") == []
    assert parse_dbf_bytes("f.dbf", b"\x07garbage") == []


def test_truncated_dbf_stops_at_readable_prefix():
    """ADVICE r9: a truncated .dbf must stop at the readable prefix
    (like parse_shp_bytes does), and a corrupt header over-claiming
    the record count — n_rec is an untrusted u32, up to 2^32 — must
    not spin through billions of empty slices."""
    _, _, dbf = build_shapefile(RECORDS, FIELDS)
    hdr_size, rec_size = struct.unpack("<HH", dbf[8:12])
    # genuine truncation: cut mid-way through record 4
    cut = dbf[: hdr_size + 3 * rec_size + rec_size // 2]
    rows = parse_dbf_bytes("f.dbf", cut)
    assert [r["recno"] for r in rows] == [1, 2, 3]
    # hostile header: claims 50M records over the same 5-record body
    forged = bytearray(dbf)
    forged[4:8] = struct.pack("<I", 50_000_000)
    t0 = time.time()
    rows = parse_dbf_bytes("f.dbf", bytes(forged))
    assert [r["recno"] for r in rows] == [1, 2, 3, 4, 5]
    assert time.time() - t0 < 5.0  # prefix-stop, not a 50M-iteration spin


def test_distributed_read_joins_geometry_and_attrs(spark, tmp_path):
    write_shapefile(str(tmp_path), "areas", RECORDS, FIELDS)
    # a second file in the same directory: the join key is (base,
    # recno), so same recnos in different files must not collide
    write_shapefile(
        str(tmp_path),
        "other",
        [(SHAPE_POINT, [[[9.0, 9.0]]], {"NAME": "other_pt", "KEY": 9, "ACTIVE": True})],
        FIELDS,
    )
    df = read_shapefile(spark, str(tmp_path))
    rows = {(r.base.rsplit("/", 1)[-1], r.recno): r for r in df.collect()}
    assert len(rows) == 6
    poly = rows[("areas", 1)]
    assert poly.shape_type == "polygon"
    assert len(poly.geometry) == 2  # outer ring + hole survive as parts
    assert poly.attrs["NAME"] == "poly_hole"
    assert rows[("other", 1)].attrs["KEY"] == "9"
    nul = rows[("areas", 5)]
    assert nul.shape_type == "null" and list(nul.geometry) == []


def test_registered_roundtrip_query_matches_rect_arithmetic(spark):
    from utility_service_areas_spark.plans.registry import all_queries

    out = all_queries()["geo_shapefile_roundtrip"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 25
    for r in rows:
        k = r.n_nationkey
        assert r.x0_milli == (k % 5) * 6 * 1000
        assert r.w_milli == (5 + (k % 3) * 2) * 1000
        assert r.n_points == 5 and r.shape_type == "polygon"
        assert r.name_back == f"NATION_{k}"


@pytest.mark.parametrize("ftype,val,want", [("N", 42, "42"), ("C", "x y", "x y")])
def test_dbf_field_width_clipping(ftype, val, want):
    recs = [(SHAPE_POINT, [[[0.0, 0.0]]], {"V": val})]
    _, _, dbf = build_shapefile(recs, [("V", ftype, 8, 0)])
    assert parse_dbf_bytes("f", dbf)[0]["attrs"]["V"] == want


# --- property-based round trip -------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _coord = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    _point = st.tuples(_coord, _coord).map(list)
    _ring = st.lists(_point, min_size=3, max_size=12)
    _polygon = st.lists(_ring, min_size=1, max_size=3)
    _attrs = st.fixed_dictionaries(
        {
            "NAME": st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=16,
            ),
            "KEY": st.integers(min_value=0, max_value=99_999_999),
        }
    )
    _record = st.one_of(
        st.tuples(st.just(SHAPE_POLYGON), _polygon, _attrs),
        st.tuples(st.just(SHAPE_POLYLINE), _polygon, _attrs),
        st.tuples(st.just(SHAPE_POINT), _point.map(lambda p: [[p]]), _attrs),
        st.tuples(st.just(SHAPE_NULL), st.just([]), _attrs),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_record, min_size=1, max_size=8))
    def test_property_roundtrip_any_records(records):
        """ANY mix of shapes and attributes must survive
        build → parse bit-exactly: coordinates are IEEE doubles on
        both sides, record numbering is 1-based and dense, and the
        dbf round trip preserves clipped/stripped field values."""
        shp, _shx, dbf = build_shapefile(records, FIELDS[:2])
        geo = parse_shp_bytes("p.shp", shp)
        at = parse_dbf_bytes("p.dbf", dbf)
        assert [g["recno"] for g in geo] == list(range(1, len(records) + 1))
        assert len(at) == len(records)
        for got, (stype, want_geom, attrs) in zip(geo, records):
            if stype == SHAPE_NULL:
                assert got["geometry"] == []
            else:
                assert got["geometry"] == [
                    [list(map(float, p)) for p in part] for part in want_geom
                ]
        for got_a, (_, _, attrs) in zip(at, records):
            want_name = attrs["NAME"].encode("ascii", "replace")[:16].decode().strip()
            assert got_a["attrs"]["NAME"] == want_name
            assert got_a["attrs"]["KEY"] == str(attrs["KEY"])

except ImportError:  # pragma: no cover - hypothesis is baked in per env
    pass


def test_shapefile_pip_fixture_layout(spark):
    """geo_shapefile_pip materializes one .shp/.dbf pair PER REGION so
    the binaryFile scan parallelizes by file, and reuses the fixture
    on re-run instead of rewriting it."""
    import glob
    import hashlib
    import os
    import tempfile

    from utility_service_areas_spark.plans.geo_queries import geo_shapefile_pip

    sf_dir = "/root/testdata/sf0.001"
    out1 = {r.n_nationkey: r.n_customers for r in geo_shapefile_pip(spark, sf_dir).collect()}
    assert len(out1) == 25

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    fix = os.path.join(tempfile.gettempdir(), f"usa_shp_pip_{tag}")
    shps = sorted(glob.glob(os.path.join(fix, "*.shp")))
    dbfs = sorted(glob.glob(os.path.join(fix, "*.dbf")))
    assert len(shps) == 5 and len(dbfs) == 5  # one pair per region

    mtimes = {p: os.path.getmtime(p) for p in shps + dbfs}
    out2 = {r.n_nationkey: r.n_customers for r in geo_shapefile_pip(spark, sf_dir).collect()}
    assert out2 == out1
    assert {p: os.path.getmtime(p) for p in shps + dbfs} == mtimes  # reused


def test_python_datasource_matches_composition_reader(spark, tmp_path):
    """spark.read.format('shapefile') (the Spark 4 Python DataSource
    connector, sources/pyds.py) must return exactly the rows of the
    binaryFile+mapInPandas composition (read_shapefile) on the same
    directory — same kernels, two packagings. Also pins partition
    planning: one input partition per .shp/.dbf pair."""
    from utility_service_areas_spark.sources.shapefile import (
        read_shapefile,
        write_shapefile,
    )

    d = str(tmp_path)
    fields = [("NAME", "C", 16, 0), ("CODE", "N", 4, 0)]
    write_shapefile(
        d,
        "areas_a",
        [
            (
                5,
                [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]],
                {"NAME": "alpha", "CODE": 1},
            ),
            (
                5,
                [[[5.0, 5.0], [9.0, 5.0], [9.0, 9.0], [5.0, 5.0]]],
                {"NAME": "beta", "CODE": 2},
            ),
        ],
        fields,
    )
    write_shapefile(
        d,
        "areas_b",
        [(1, [[[3.5, 4.5]]], {"NAME": "gamma", "CODE": 3})],
        fields,
    )

    ds = spark.read.format("shapefile").load(d)
    # FULL-ROW parity including base: the connector normalizes base to
    # binaryFile's file:/abs/path form, so no column needs stripping.
    key = lambda r: (  # noqa: E731
        r.base,
        r.recno,
        r.shape_type,
        str(r.geometry),
        str(dict(r.attrs)),
    )
    got = {key(r) for r in ds.collect()}
    want = {key(r) for r in read_shapefile(spark, d).collect()}
    assert got == want and len(got) == 3
    assert ds.rdd.getNumPartitions() == 2  # one per shapefile pair


def test_python_datasource_empty_dir_and_fixed_schema(spark, tmp_path):
    """Behavioral parity with the composition reader: an empty (or
    not-yet-created) directory is an EMPTY frame, never an error; and
    a user-supplied schema is rejected loudly — read() yields tuples
    positionally, so honoring a reordered schema would silently
    mislabel columns."""
    import pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    assert spark.read.format("shapefile").load(str(empty)).count() == 0

    with pytest.raises(Exception, match="fixed schema"):
        spark.read.format("shapefile").schema(
            "recno bigint, base string"
        ).load(str(empty)).collect()


def test_python_datasource_stream_is_incremental(spark, tmp_path):
    """S28: readStream.format('shapefile') — the streaming half of the
    Python DataSource connector. Two drains against ONE checkpoint:
    the first sees both initial files, the second (after a third file
    drops) processes ONLY the new pair — the positional offset into
    the sorted base listing is the incremental contract."""
    from utility_service_areas_spark.sources.shapefile import write_shapefile

    data_dir = tmp_path / "shp"
    data_dir.mkdir()
    fields = [("NAME", "C", 16, 0)]

    def drop(base, name, x):
        write_shapefile(
            str(data_dir),
            base,
            [(1, [[[x, x]]], {"NAME": name})],
            fields,
        )

    drop("a_first", "alpha", 1.0)
    drop("b_second", "beta", 2.0)

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        q = (
            spark.readStream.format("shapefile")
            .load(str(data_dir))
            .select("base", "attrs")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream drain timed out"
        return sorted(
            (r.base.rsplit("/", 1)[-1], r.attrs["NAME"])
            for r in spark.read.parquet(sink).collect()
        )

    first = drain()
    assert first == [("a_first", "alpha"), ("b_second", "beta")]

    drop("c_third", "gamma", 3.0)  # append-only, lexicographically after
    second = drain()
    # exactly-once across restarts: the old pairs are NOT re-emitted,
    # only the newly dropped pair lands in the sink
    assert second == [
        ("a_first", "alpha"),
        ("b_second", "beta"),
        ("c_third", "gamma"),
    ], "second drain must process ONLY the newly dropped pair"


def test_stream_reader_raises_when_committed_offset_uncoverable(tmp_path):
    """ADVICE r11 (pyds.py): if a replayed offset promises more pairs
    than the directory can list (files deleted/renamed after commit),
    partitions() must raise — silently slicing short would drop
    records while the stream keeps reporting success, violating the
    exactly-once contract."""
    import pytest

    from utility_service_areas_spark.sources.pyds import ShapefileStreamReader

    reader = ShapefileStreamReader({"path": str(tmp_path)})
    with pytest.raises(RuntimeError, match="append-only"):
        reader.partitions({"idx": 0}, {"idx": 3})


def test_python_datasource_writer_roundtrip_and_overwrite(spark, tmp_path):
    """S31 — df.write.format('shapefile'): each task writes temp files,
    only the driver-side commit renames them to part-N (the Spark
    write protocol). Round-trip: write via the connector, read via the
    connector, full record parity; overwrite mode replaces prior
    part files; no _tmp- leftovers survive a successful commit."""
    out = str(tmp_path / "out")
    rows = [
        ("polygon", [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]], {"NAME": "alpha", "CODE": "1"}),
        ("polygon", [[[5.0, 5.0], [9.0, 5.0], [9.0, 9.0], [5.0, 5.0]]], {"NAME": "beta", "CODE": "2"}),
        ("point", [[[3.5, 4.5]]], {"NAME": "gamma", "CODE": "3"}),
    ]
    df = spark.createDataFrame(
        rows,
        "shape_type string, geometry array<array<array<double>>>, "
        "attrs map<string,string>",
    ).repartition(2)
    (
        df.write.format("shapefile")
        .option("fields", "NAME:C:16:0,CODE:N:4:0")
        .mode("append")
        .save(out)
    )
    import os

    names = sorted(os.listdir(out))
    assert not any(n.startswith("_tmp-") for n in names), names
    assert any(n.startswith("part-") and n.endswith(".shp") for n in names)

    back = spark.read.format("shapefile").load(out)
    got = sorted(
        (r.shape_type, str(r.geometry), r.attrs["NAME"], r.attrs["CODE"].strip())
        for r in back.collect()
    )
    want = sorted(
        (st, str(geom), a["NAME"], a["CODE"]) for st, geom, a in rows
    )
    assert got == want

    # overwrite: a 1-row write replaces all previous parts
    one = spark.createDataFrame(
        rows[:1],
        "shape_type string, geometry array<array<array<double>>>, "
        "attrs map<string,string>",
    ).coalesce(1)
    (
        one.write.format("shapefile")
        .option("fields", "NAME:C:16:0,CODE:N:4:0")
        .mode("overwrite")
        .save(out)
    )
    assert spark.read.format("shapefile").load(out).count() == 1


def test_python_datasource_writer_append_adds_not_replaces(spark, tmp_path):
    """r13 ADVICE-high regression: two sequential .mode('append') jobs
    into the same directory must BOTH survive. The r12 writer named
    every job's outputs part-{pid}, so the second append's os.replace
    silently overwrote the first job's trio (verified data loss).
    Now the driver-side commit assigns a job-sequence prefix
    (part-{seq:05d}-{pid:05d}) strictly greater than anything already
    in the directory, so appends extend the sorted listing — which
    also preserves the streaming reader's positional-offset
    exactly-once contract."""
    import os

    out = str(tmp_path / "out")
    schema = (
        "shape_type string, geometry array<array<array<double>>>, "
        "attrs map<string,string>"
    )

    def write_one(name):
        df = spark.createDataFrame(
            [("point", [[[1.0, 2.0]]], {"NAME": name})], schema
        ).coalesce(1)
        (
            df.write.format("shapefile")
            .option("fields", "NAME:C:16:0")
            .mode("append")
            .save(out)
        )

    write_one("first")
    bases_after_first = sorted(
        n[:-4] for n in os.listdir(out) if n.endswith(".shp")
    )
    write_one("second")
    bases_after_second = sorted(
        n[:-4] for n in os.listdir(out) if n.endswith(".shp")
    )

    # both jobs' rows survive
    back = spark.read.format("shapefile").load(out)
    names = sorted(r.attrs["NAME"].strip() for r in back.collect())
    assert names == ["first", "second"]
    # append EXTENDED the sorted listing: old bases unchanged and
    # every new base sorts after all old ones
    assert bases_after_second[: len(bases_after_first)] == bases_after_first
    new = [b for b in bases_after_second if b not in bases_after_first]
    assert new and all(b > max(bases_after_first) for b in new)


def test_python_datasource_writer_abort_leaves_no_temps(spark, tmp_path):
    """A failing task must abort the job and leave the directory free
    of temp files — a crashed write can never surface half a pair to
    a reader."""
    import os

    import pytest

    out = str(tmp_path / "out")
    bad = spark.createDataFrame(
        [("polygon", [[["oops", 0.0]]], {"NAME": "x"})],
        "shape_type string, geometry array<array<array<string>>>, "
        "attrs map<string,string>",
    ).selectExpr(
        "shape_type",
        "CAST(geometry AS array<array<array<double>>>) AS geometry",
        "attrs",
    ).selectExpr(
        "shape_type",
        # NULL point x -> float(None) raises inside write()
        "transform(geometry, p -> transform(p, q -> array(q[0], q[1]))) AS geometry",
        "attrs",
    )
    with pytest.raises(Exception):
        (
            bad.write.format("shapefile")
            .option("fields", "NAME:C:16:0")
            .mode("append")
            .save(out)
        )
    leftovers = [n for n in os.listdir(out)] if os.path.exists(out) else []
    assert not any(n.startswith("_tmp-") for n in leftovers), leftovers
    assert not any(n.startswith("part-") for n in leftovers), leftovers


def test_python_datasource_writer_rejects_wrong_schema_and_missing_fields(
    spark, tmp_path
):
    import pytest

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(Exception, match="expects columns"):
        df.write.format("shapefile").option("fields", "A:C:4:0").mode(
            "append"
        ).save(str(tmp_path / "o1"))

    ok = spark.createDataFrame(
        [(1, [[[0.0, 0.0]]], {"A": "v"})],
        "shape_type string, geometry array<array<array<double>>>, "
        "attrs map<string,string>",
    )
    with pytest.raises(Exception, match="fields"):
        ok.write.format("shapefile").mode("append").save(str(tmp_path / "o2"))


def test_reader_ignores_underscore_temp_files(spark, tmp_path):
    """Code-review r12: uncommitted writer temps (`_tmp-...`) live in
    the target directory until the driver-side commit renames them —
    the reader must never list them (Hadoop's hidden-file convention,
    which binaryFile already applies), or a read racing a write
    observes half-written pairs and the streaming positional offset
    shifts."""
    from utility_service_areas_spark.sources.shapefile import write_shapefile

    d = str(tmp_path)
    fields = [("NAME", "C", 8, 0)]
    write_shapefile(d, "part-00000", [(1, [[[1.0, 2.0]]], {"NAME": "ok"})], fields)
    # a stranded temp trio from a crashed writer
    write_shapefile(
        d, "_tmp-dead-part-00001", [(1, [[[9.0, 9.0]]], {"NAME": "no"})], fields
    )
    got = spark.read.format("shapefile").load(d).collect()
    assert len(got) == 1 and got[0].attrs["NAME"].strip() == "ok"
