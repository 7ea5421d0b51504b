from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from utility_service_areas_spark.session import build_session

    s = build_session("usa-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
