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


asof_strategy = st.tuples(
    # left: (key, ts) rows
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=25),
    # right: (key, ts) pairs made unique per key below, with a value
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
             min_size=1, max_size=25),
)


@given(data=asof_strategy)
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    from utility_service_areas_spark.operators.temporal import asof_join

    left_rows, right_raw = data
    # unique (key, ts) on the right: the operator's documented
    # determinism precondition (and merge_asof's too)
    seen = set()
    right_rows = []
    for k, ts, v in right_raw:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_rows.append((k, ts, v))
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left_rows)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(right_rows, ["k", "ts", "val"])
    got = {
        r.lid: r.asof_val
        for r in asof_join(left, right, ["k"], "ts", ["val"]).collect()
    }
    lp = pd.DataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left_rows)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "val"]).sort_values(
        "ts", kind="stable"
    )
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in merged.itertuples()
    }
    assert got == want


edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=30
).filter(lambda es: any(a != b for a, b in es))


@given(edges=edges_strategy)
@settings(max_examples=5, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    from utility_service_areas_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.comp for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


rect_strategy = st.tuples(
    st.integers(0, 12), st.integers(0, 12), st.integers(1, 6), st.integers(1, 6)
)


@given(ra=rect_strategy, rb=rect_strategy, rc=rect_strategy)
@settings(max_examples=40, deadline=None)
def test_union_all_matches_inclusion_exclusion(ra, rb, rc):
    """union_all over rect TRIPLES vs closed-form inclusion-exclusion —
    exercises the pairwise-overlay fold beyond what pair identities
    can (nested overlaps, triple intersections, chained adjacency)."""
    from utility_service_areas_spark.functions.geometry import (
        multipolygon_area,
        rect_polygon,
        union_all,
    )

    def inter(*rs):
        x0 = max(r[0] for r in rs)
        y0 = max(r[1] for r in rs)
        x1 = min(r[0] + r[2] for r in rs)
        y1 = min(r[1] + r[3] for r in rs)
        return max(0, x1 - x0) * max(0, y1 - y0)

    want = (
        sum(r[2] * r[3] for r in (ra, rb, rc))
        - inter(ra, rb) - inter(ra, rc) - inter(rb, rc)
        + inter(ra, rb, rc)
    )
    got = multipolygon_area(union_all([rect_polygon(*r) for r in (ra, rb, rc)]))
    assert abs(got - want) <= 1e-6


quota_strategy = st.lists(
    st.tuples(
        st.integers(0, 1_000_000),  # doc_id (may repeat; dedup below)
        st.integers(0, 3),  # source bucket
    ),
    min_size=1,
    max_size=60,
)


@given(rows=quota_strategy)
@settings(max_examples=10, deadline=None)
def test_salted_quota_topk_matches_single_window(spark, rows):
    """Property version of the domain-quota exactness test: for ANY id
    distribution, the two-phase salted top-K equals the single global
    window per source (the salting must be a pure plan change)."""
    import hashlib

    k = 5
    uniq = {}
    for doc_id, src in rows:
        uniq[doc_id] = f"s{src}"
    df = spark.createDataFrame(
        [(d, s) for d, s in uniq.items()], ["doc_id", "source"]
    )
    salted = df.withColumn(
        "rk", F.md5(F.col("doc_id").cast("string"))
    ).withColumn("s", F.pmod(F.hash("doc_id"), F.lit(8)))
    from pyspark.sql.window import Window

    w1 = Window.partitionBy("source", "s").orderBy("rk", "doc_id")
    w2 = Window.partitionBy("source").orderBy("rk", "doc_id")
    got = {
        (r.doc_id, r.source, r.rnk)
        for r in salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "source", "rnk")
        .collect()
    }
    # independent python reference
    by_src: dict[str, list] = {}
    for d, s in uniq.items():
        by_src.setdefault(s, []).append(d)
    want = set()
    for s, ids in by_src.items():
        ordered = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        for i, d in enumerate(ordered[:k]):
            want.add((d, s, i + 1))
    assert got == want


rep_strategy = st.lists(
    st.lists(st.sampled_from("ab c".split() + ["ab", "x"]), min_size=1, max_size=8),
    min_size=1,
    max_size=10,
)


@given(docs=rep_strategy)
@settings(max_examples=10, deadline=None)
def test_repetition_signals_match_python(spark, docs):
    """The tagged-explode unigram/bigram aggregation must match a
    direct python recount for arbitrary token streams (repeats, single
    tokens, all-identical docs)."""
    from utility_service_areas_spark.plans.text_queries import (
        docs_repetition_signals,
    )
    import os
    import tempfile

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r.doc_id: r for r in docs_repetition_signals(spark, td).collect()}
    for i, toks in enumerate(docs):
        n = len(toks)
        uni: dict[str, int] = {}
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        bi: dict[tuple, int] = {}
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
        r = out[i]
        assert r.n_tok == n
        assert r.top_tok_micros == round(1e6 * max(uni.values()) / n)
        assert r.dup_tok_micros == round(
            1e6 * sum(c for c in uni.values() if c >= 2) / n
        )
        assert r.top_bigram_micros == (
            round(1e6 * max(bi.values()) / (n - 1)) if n >= 2 else 0
        )
