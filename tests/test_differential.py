"""Differential property tests: operators vs an independent pandas
implementation on hypothesis-generated frames — catches semantics
drift the fixed fixtures can't.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from utility_service_areas_spark.operators.relational import (
    dedup_first_per_key,
    latest_per_group,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # key
        st.integers(0, 10),  # ts
        st.integers(0, 100),  # id (may repeat!)
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(max_examples=20, deadline=None)
def test_latest_per_group_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, ["k", "ts", "id"])
    got = {
        r.k: (r.ts, r.id)
        for r in latest_per_group(
            df, ["k"], [F.col("ts").desc(), F.col("id").desc()]
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "id"])
    want = {
        k: (g.sort_values(["ts", "id"], ascending=False).iloc[0].ts,
            g.sort_values(["ts", "id"], ascending=False).iloc[0].id)
        for k, g in pdf.groupby("k")
    }
    assert got == want


@given(rows=rows_strategy)
@settings(max_examples=20, deadline=None)
def test_dedup_first_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, ["k", "ts", "id"])
    got = {
        r.k: (r.ts, r.id)
        for r in dedup_first_per_key(df, ["k"], [F.col("ts"), F.col("id")]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "id"])
    want = {
        k: tuple(g.sort_values(["ts", "id"]).iloc[0][["ts", "id"]])
        for k, g in pdf.groupby("k")
    }
    assert got == want
