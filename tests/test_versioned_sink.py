"""Versioned table sink S33 (sources/versioned.py): snapshot commit,
time travel, crash safety, diff across versions, commit-race claim.
"""

from __future__ import annotations

import json
import os

import pytest

from utility_service_areas_spark.sources.versioned import (
    diff_versions,
    list_versions,
    read_version,
    write_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_round_trip_append_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = write_version(_df(spark, [(1, "a"), (2, "b")]), t)
    v1 = write_version(_df(spark, [(3, "c")]), t, mode="append")
    assert (v0, v1) == (0, 1)
    assert list_versions(t) == [0, 1]

    # latest = union; v0 unchanged (time travel)
    latest = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert latest == {(1, "a"), (2, "b"), (3, "c")}
    old = {(r.k, r.v) for r in read_version(spark, t, 0).collect()}
    assert old == {(1, "a"), (2, "b")}

    # overwrite starts a new lineage; every prior version stays readable
    v2 = write_version(_df(spark, [(9, "z")]), t, mode="overwrite")
    assert v2 == 2
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {(9, "z")}
    assert {
        (r.k, r.v) for r in read_version(spark, t, 1).collect()
    } == {(1, "a"), (2, "b"), (3, "c")}


def test_crash_mid_commit_is_invisible(spark, tmp_path):
    """Orphan data dirs + torn temp manifests (a writer that died
    before the atomic claim) must never surface to readers."""
    t = str(tmp_path / "tbl")
    write_version(_df(spark, [(1, "a")]), t)

    # simulate a crashed commit: data written, temp manifest written,
    # claim never happened
    orphan = os.path.join(t, "data", "commit-deadbeef")
    _df(spark, [(666, "ghost")]).write.parquet(orphan)
    with open(os.path.join(t, "_tmp-v1-deadbeef.json"), "w") as f:
        json.dump({"version": 1, "data_dirs": ["data/commit-deadbeef"]}, f)

    assert list_versions(t) == [0]
    rows = {(r.k, r.v) for r in read_version(spark, t).collect()}
    assert rows == {(1, "a")}
    # and the next commit is unaffected, claiming v1 normally
    v1 = write_version(_df(spark, [(2, "b")]), t, mode="append")
    assert v1 == 1
    assert {(r.k, r.v) for r in read_version(spark, t).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_version_claim_is_first_writer_wins(spark, tmp_path):
    """The os.link claim is exclusive: a manifest name that already
    exists makes the writer RETRY at the next number — two commits
    can never share a version, and the loser's manifest includes the
    winner's rows (recomputed against the winner)."""
    t = str(tmp_path / "tbl")
    write_version(_df(spark, [(1, "a")]), t)
    # occupy v1 by hand (the "concurrent winner")
    man0 = json.load(open(os.path.join(t, "_v0.json")))
    with open(os.path.join(t, "_v1.json"), "w") as f:
        json.dump({**man0, "version": 1}, f)
    v = write_version(_df(spark, [(2, "b")]), t, mode="append")
    assert v == 2
    man2 = json.load(open(os.path.join(t, "_v2.json")))
    assert len(man2["data_dirs"]) == 2  # winner's lineage + this commit
    # no stranded temp manifests from the lost race
    assert not [n for n in os.listdir(t) if n.startswith("_tmp-")]


def test_append_schema_drift_is_loud(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, [(1, "a")]), t)
    bad = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_version(bad, t, mode="append")
    # overwrite may change schema; old version keeps the old one
    write_version(bad, t, mode="overwrite")
    assert read_version(spark, t).schema["v"].dataType.simpleString() == "double"
    assert (
        read_version(spark, t, 0).schema["v"].dataType.simpleString()
        == "string"
    )


def test_diff_across_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, [(1, "a"), (2, "b")]), t)
    write_version(_df(spark, [(3, "c")]), t, mode="append")
    write_version(_df(spark, [(2, "b"), (4, "d")]), t, mode="overwrite")

    d01 = diff_versions(spark, t, 0, 1)
    assert d01 == {"added": 1, "removed": 0, "n_rows_old": 2, "n_rows_new": 3}
    d12 = diff_versions(spark, t, 1, 2)
    assert d12["added"] == 1 and d12["removed"] == 2  # kept (2,b); +(4,d)
    assert d12["n_rows_new"] == 2
