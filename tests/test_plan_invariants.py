"""Registry-wide mechanical scale-lint: build EVERY registered
query's physical plan at sf0.001 and assert the two structures that
do not survive a 100 TB cluster never appear:

- ``BatchEvalPython`` — row-at-a-time Python UDF eval. Every Python
  kernel in this repo is Arrow-batched (ArrowEvalPython / MapInPandas
  / FlatMapGroupsInPandas); a row-wise UDF sneaking into a hot path
  is a 10-100x regression the test suite would otherwise only catch
  as a slow bench.
- ``CartesianProduct`` — a non-broadcast cross join. Intentional
  small-dim cross joins compile to BroadcastNestedLoopJoin (bounded
  build side); a CartesianProduct means BOTH sides are cluster-sized,
  which is never survivable.

This complements tests/test_plans.py (which pins the SHAPE of chosen
headline plans) with a cheap invariant over the whole surface, so
every future query addition is linted automatically.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_BANNED = ("BatchEvalPython", "CartesianProduct")


def _all_query_names():
    from utility_service_areas_spark.plans.registry import all_queries

    return sorted(all_queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_no_rowwise_python_or_cartesian(spark, name):
    from utility_service_areas_spark.plans.registry import all_queries

    df = all_queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    for banned in _BANNED:
        assert banned not in plan, f"{name}: {banned} in physical plan"
