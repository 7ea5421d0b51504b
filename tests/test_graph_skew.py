"""Connected-components dedup resolution, salted join equivalence,
IVF recall, and the stream-stream join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from utility_service_areas_spark.operators.ann import brute_force_topk, ivf_topk
from utility_service_areas_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from utility_service_areas_spark.operators.skew import salted_join


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4 plus clique 10-11-12 plus pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cluster_density_chain_vs_clique(spark):
    from utility_service_areas_spark.operators.graph import cluster_density

    # chain 1-2-3-4 (0 triangles, transitivity 0), triangle 10-11-12
    # (1 triangle, transitivity 1.0), pair 20-21 (0 wedges → 0)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    rows = {r.cluster_id: r for r in cluster_density(pairs).collect()}
    assert set(rows) == {1, 10, 20}
    chain = rows[1]
    assert (chain.n_docs, chain.n_edges, chain.n_triangles) == (4, 3, 0)
    assert chain.edge_density_micros == 500_000  # 2*3/(4*3)
    assert chain.transitivity_micros == 0  # 2 wedges, no closure
    clique = rows[10]
    assert (clique.n_docs, clique.n_edges, clique.n_triangles) == (3, 3, 1)
    assert clique.edge_density_micros == 1_000_000
    assert clique.transitivity_micros == 1_000_000
    pair = rows[20]
    assert (pair.n_docs, pair.n_edges, pair.n_triangles) == (2, 1, 0)
    assert pair.edge_density_micros == 1_000_000
    assert pair.transitivity_micros == 0  # 0 wedges guard


def test_dedup_clusters_with_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 9]], ["doc_id"])
    out = {r.doc_id: (r.keeper_id, r.cluster_size) for r in dedup_clusters(pairs, ids, "doc_id").collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 1), 9: (9, 1)}


def test_salted_join_equivalent_to_plain(spark):
    # skewed facts: 90% of rows share key 1
    facts = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, float(i)) for i in range(1000)], ["fid", "k", "v"]
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "label"])
    plain = facts.join(dim, "k").select("fid", "label")
    salted = salted_join(facts, dim, "k", salt_source=F.col("fid"), n_salts=8).select(
        "fid", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left-join nulls survive salting too
    plain_l = facts.join(dim.filter("k = 1"), "k", "left").select("fid", "label")
    salted_l = salted_join(
        facts, dim.filter("k = 1"), "k", salt_source=F.col("fid"), n_salts=8, how="left"
    ).select("fid", "label")
    assert sorted(map(tuple, plain_l.collect()), key=str) == sorted(
        map(tuple, salted_l.collect()), key=str
    )


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SMOKE_SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall  # 3/8 of cells probed


def test_stream_stream_join_equals_batch(spark):
    from utility_service_areas_spark.sources.tables import load_table
    from utility_service_areas_spark.streaming.events import (
        click_purchase_join,
        read_events_stream,
        run_to_memory,
    )

    run_to_memory(
        click_purchase_join(read_events_stream(spark, SMOKE_SF)), "t_ssjoin", "append"
    )
    got = {
        (r.purchase_id, r.click_id) for r in spark.table("t_ssjoin").collect()
    }
    ev = load_table(spark, SMOKE_SF, "events")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured (cluster posture), the loop
    uses reliable checkpoint() instead of localCheckpoint and still
    converges on a long chain (worst case for label propagation)."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ck"))
    try:
        n = 12
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], ["doc_a", "doc_b"]
        )
        comp = {r.node: r.comp for r in connected_components(pairs).collect()}
        assert comp == {i: 1 for i in range(1, n + 1)}
    finally:
        # restore: no checkpoint dir for the rest of the suite
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.apply(None))
        assert sc.getCheckpointDir() is None
