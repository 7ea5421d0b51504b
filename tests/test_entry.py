"""Driver-contract smoke tests: entry() runs, every queries() entry
runs at sf0.001 with a stable schema, every oracle key exists in
queries().
"""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 17


@pytest.mark.parametrize("name", sorted(__import__("__spark_entry__").queries()))
def test_query_runs_smoke(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SMOKE_SF)
    # Schema must be resolvable and the query executable end-to-end.
    assert df.columns == list(dict.fromkeys(df.columns)), "duplicate column names"
    assert df.count() >= 0
