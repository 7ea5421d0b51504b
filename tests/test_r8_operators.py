"""Property tests for the r8 operators: triangle counts vs brute
force, containment on crafted corpora, mixing-weight invariants,
skew-profile invariants, semantic-dedup keeper properties.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF


def test_triangle_counts_match_bruteforce_random_graph(spark):
    """triangle_counts must equal the O(n^3) brute force on a seeded
    random graph — orientation/tie-break bugs (double- or zero-
    counting a triangle whose nodes tie on degree) show up here."""
    import random

    from utility_service_areas_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.15
        }
    )
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_triangle_counts_clique_and_chain(spark):
    """A k-clique node sits in C(k-1, 2) triangles; a chain node in
    zero — the exact density separation the query doc claims."""
    from utility_service_areas_spark.operators.graph import triangle_counts

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(100 + i, 101 + i) for i in range(6)]
    df = spark.createDataFrame(clique + chain, ["doc_a", "doc_b"])
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    for n in range(5):
        assert got[n] == 6  # C(4,2)
    assert not any(n >= 100 for n in got)  # chain: no triangles


def test_containment_pairs_detects_planted_subset(spark):
    """A doc whose shingles are a strict subset of another's must come
    back (contained, container) with containment 1.0; two unrelated
    docs must not pair."""
    from utility_service_areas_spark.operators.dedup import containment_pairs

    big = " ".join(f"tok{i}" for i in range(40))
    small = " ".join(f"tok{i}" for i in range(12))  # strict prefix
    other = " ".join(f"zzz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], ["doc_id", "text"]
    )
    rows = containment_pairs(df, "doc_id", "text", c_threshold=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.contained_id, r.container_id) == (2, 1)
    assert r.containment_micros == 1_000_000
    assert r.jaccard_micros < 500_000


def test_containment_direction_on_equal_sizes(spark):
    """Equal shingle-set sizes tie-break to the lower id as contained
    (doc_a < doc_b by bucket construction)."""
    from utility_service_areas_spark.operators.dedup import containment_pairs

    text = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame([(5, text), (9, text)], ["doc_id", "text"])
    rows = containment_pairs(df, "doc_id", "text").collect()
    assert len(rows) == 1
    assert (rows[0].contained_id, rows[0].container_id) == (5, 9)
    assert rows[0].containment_micros == 1_000_000


def test_mixing_weights_invariants(spark):
    """Weights sum to ~1e6, every source appears once, and sqrt
    temperature strictly compresses the share range (max share down,
    min share up vs raw)."""
    from utility_service_areas_spark.plans.registry import all_queries

    rows = all_queries()["source_mixing_weights"](spark, SMOKE_SF).collect()
    n_src = len(rows)
    assert n_src == len({r.source for r in rows})
    tot_w = sum(r.weight_micros for r in rows)
    assert abs(tot_w - 1_000_000) <= n_src  # floor(+0.5) per-row slack
    assert max(r.weight_micros for r in rows) <= max(
        r.raw_share_micros for r in rows
    )
    assert min(r.weight_micros for r in rows) >= min(
        r.raw_share_micros for r in rows
    )
    for r in rows:
        assert r.upweighted == (r.weight_micros > r.raw_share_micros)


def test_skew_profile_invariants(spark):
    """Ranks are 1..k by descending count; shares match counts; the
    effective key count lands in (0, n_keys] and equals n_keys only
    for a perfectly uniform distribution."""
    from utility_service_areas_spark.plans.registry import all_queries

    rows = sorted(
        all_queries()["join_key_skew_profile"](spark, SMOKE_SF).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    g = rows[0]
    assert 0 < g.neff_keys_micros <= g.n_keys * 1_000_000
    ev = spark.read.parquet(SMOKE_SF + "/events.parquet")
    per = ev.groupBy("user_id").count().collect()
    tot = sum(r["count"] for r in per)
    sumsq = sum(r["count"] ** 2 for r in per)
    import math

    assert g.n_keys == len(per) and g.total_rows == tot
    assert g.neff_keys_micros == math.floor(tot * 1.0 * tot * 1_000_000 / sumsq + 0.5)


def test_semantic_dedup_keeper_properties(spark):
    """Every vector resolves to a keeper; keepers keep themselves;
    the keeper of a group is its min vec_id; kept rows == distinct
    keepers."""
    from utility_service_areas_spark.plans.registry import all_queries

    rows = all_queries()["semantic_dedup_keep"](spark, SMOKE_SF).collect()
    by_id = {r.vec_id: r for r in rows}
    emb_n = spark.read.parquet(SMOKE_SF + "/embeddings.parquet").count()
    assert len(rows) == emb_n
    keepers = {r.keeper_id for r in rows}
    for k in keepers:
        assert by_id[k].is_kept and by_id[k].keeper_id == k
    for r in rows:
        assert r.keeper_id <= r.vec_id  # keeper = min id of the group
        assert r.is_kept == (r.keeper_id == r.vec_id)
    assert sum(1 for r in rows if r.is_kept) == len(keepers)


def test_market_basket_lift_matches_bruteforce(spark, tmp_path):
    """Lift and counts on a crafted basket set: pair (1,2) co-ordered
    3/4 baskets, each alone in all 4 -> lift = (3/4)/((4/4)*(4/4))."""
    import os

    rows = []
    # 4 orders; parts 1 and 2 together in orders 0-2; separated in 3/4
    for o in range(3):
        rows += [(o, 1), (o, 2)]
    rows += [(3, 1), (4, 2)]
    spark.createDataFrame(rows, ["l_orderkey", "l_partkey"]).write.parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    from utility_service_areas_spark.plans.registry import all_queries

    got = all_queries()["market_basket_pairs"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.part_a, r.part_b, r.n_co, r.n_a, r.n_b) == (1, 2, 3, 4, 4)
    # lift = 3 * 5 / (4 * 4) = 0.9375
    assert r.lift_micros == 937_500


def test_snapshot_diff_classifies_all_four_classes(spark, tmp_path):
    """Classifier check on crafted ids: residue 7 -> added, 3 ->
    removed, 5 -> changed (the sim's deterministic v2 mutation),
    everything else unchanged; counts reconcile with the table."""
    import os

    rows = [(i, f"text {i}", f"s{i % 2}") for i in range(20)]
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    from utility_service_areas_spark.plans.registry import all_queries

    got = {
        (r.source, r.change): r.n_docs
        for r in all_queries()["dataset_snapshot_diff"](
            spark, str(tmp_path)
        ).collect()
    }
    # ids 7, 17 -> added; 3, 13 -> removed; 5, 15 -> changed (all odd)
    assert got[("s1", "added")] == 2
    assert got[("s1", "removed")] == 2
    assert got[("s1", "changed")] == 2
    assert got[("s0", "unchanged")] == 10
    assert got[("s1", "unchanged")] == 4
    assert sum(got.values()) == 20


def test_rollup_incremental_equals_direct(spark):
    """The merged old-state + batch rollup must equal a direct
    groupBy over all orders (the algebraic-aggregate law)."""
    from pyspark.sql import functions as F

    from utility_service_areas_spark.plans.registry import all_queries

    got = sorted(
        map(
            tuple,
            all_queries()["orders_rollup_incremental"](
                spark, SMOKE_SF
            ).collect(),
        )
    )
    orders = spark.read.parquet(SMOKE_SF + "/orders.parquet")
    want = sorted(
        map(
            tuple,
            orders.groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("total_cents"),
                F.min("o_orderdate").alias("first_order"),
                F.max("o_orderdate").alias("last_order"),
            )
            .collect(),
        )
    )
    assert got == want
