from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF = "/root/testdata/sf0.001"


def backdate_tree(path: str, ts: float = 0.0) -> None:
    """Set mtime on a path AND everything under it — the vacuum age
    gates key off the NEWEST entry in the tree (ADVICE r14 #4), so a
    test planting 'ancient' debris must age the whole tree."""
    os.utime(path, (ts, ts))
    for walk_root, dirs, files in os.walk(path):
        for name in dirs + files:
            os.utime(os.path.join(walk_root, name), (ts, ts))


@pytest.fixture(scope="session")
def spark():
    from utility_service_areas_spark.session import build_session

    s = build_session("usa-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
