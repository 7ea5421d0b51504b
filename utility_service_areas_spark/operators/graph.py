"""Iterative graph operators: connected components over candidate
pairs — the endgame of every dedup family (pairs → clusters →
canonical keeper per cluster).

Implementation is large-star/small-star-style min-label propagation:
each iteration joins the current labels across the edge list and
takes the min neighbor label, until a fixpoint. Iterations are
O(diameter); dedup graphs are near-clique clusters, so 2-4 rounds
converge. Each round is one shuffle; intermediate frames are
checkpointed (localCheckpoint) to cut the growing lineage — the
standard Spark iterative-algorithm discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utility_service_areas_spark.operators.spread import cpu_spread_width

# Small-graph fast path (r17): a pair graph that fits comfortably on
# the driver is solved there with union-find instead of running the
# iterative join loop — the distributed rounds are pure scheduling
# overhead when the edge list is KB-sized (each round costs an
# analysis pass + an AQE job + a collect for the fingerprint; a
# 5-round convergence is ~10 jobs for a graph union-find resolves in
# microseconds). The labels are identical BY CONSTRUCTION: component =
# min node id, the same fixpoint the propagation loop reaches
# (equivalence pinned in tests). The cap is edge rows, parameterized
# for deployments; above it — every at-scale corpus — the loop runs
# exactly as before, having spent one O(cap)-row limit job to decide
# (the partitions it materialized stay cached for round 1). Driver
# memory is bounded: cap rows × 2 ids. Same sanctioned class of
# driver-side fold as Lloyd's k-centroid collect (kmeans.py).
_LOCAL_CC_ENV = "SPARK_GRAFT_LOCAL_CC_EDGES"
_LOCAL_CC_DEFAULT = 100_000


def _local_cc_cap() -> int:
    try:
        return int(os.environ.get(_LOCAL_CC_ENV, _LOCAL_CC_DEFAULT))
    except ValueError:
        return _LOCAL_CC_DEFAULT


def _local_cc_fastpath(edges: DataFrame) -> DataFrame | None:
    """Union-find labels for a small symmetric edge frame, or None when
    the graph exceeds the cap (or node ids aren't plainly orderable
    across engines — only numeric ids take the fast path; Python and
    SQL string collation subtleties stay out of scope)."""
    cap = _local_cc_cap()
    if cap <= 0:
        return None
    u_type, v_type = (f.dataType.typeName() for f in edges.schema.fields[:2])
    numeric = {"byte", "short", "integer", "long"}
    if u_type not in numeric or u_type != v_type:
        return None
    rows = edges.limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    labels = [(n, find(n)) for n in parent]
    # Hand the labels back through pandas/Arrow: createDataFrame on a
    # pandas frame plans as a LocalTableScan — no RDD, no job, and
    # crucially no PythonRDD pickle stage (the list overload
    # parallelizes to defaultParallelism pickle tasks, whose worker
    # pool has its OWN PythonWorkerFactory key — measured in-bench as
    # a fresh Python daemon + preload-import storm blocking all 32
    # task slots for ~7 s the first time a query hit it).
    import numpy as np
    import pandas as pd

    np_type = {
        "byte": "int8",
        "short": "int16",
        "integer": "int32",
        "long": "int64",
    }[u_type]
    pdf = pd.DataFrame(
        {
            "node": np.fromiter((n for n, _ in labels), dtype=np_type),
            "comp": np.fromiter((c for _, c in labels), dtype=np_type),
        }
    )
    return edges.sparkSession.createDataFrame(
        pdf, f"node {u_type}, comp {u_type}"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    symmetric: bool = False,
    pre_materialized: bool = False,
    width: int | None = None,
) -> DataFrame:
    """Edge list → (node, component) where component = min node id of
    the connected component. Nodes only in no pair are absent (callers
    union isolated ids if needed). ``symmetric=True`` promises the
    input already holds BOTH directions of every edge, deduplicated
    (e.g. cluster_density's checkpointed `und`) — the union+distinct
    shuffle is skipped. ``pre_materialized=True`` (implies symmetric)
    additionally promises the caller already checkpointed the edge
    frame — the repartition + second checkpoint pass is skipped too
    (the lineage cut is the load-bearing part; the co-partitioning
    was only a ~6%-warm win, see below).
    """
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    if not (symmetric or pre_materialized):
        edges = edges.union(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        ).distinct()
    # Reliable checkpointing when the caller configured a checkpoint
    # dir (cluster posture: survives executor loss; localCheckpoint
    # would recompute the whole lineage on loss). Local/test runs fall
    # back to localCheckpoint — same lineage cut, no HDFS round-trip.
    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None
    # Materialize the edge list ONCE, PRE-PARTITIONED on the join key
    # (r8): checkpoint preserves outputPartitioning, so every round's
    # edge⋈label join shuffles only the node-sized label frame — the
    # (2×pairs)-sized edge list never re-shuffles after round 0.
    # Measured at 30× (2.56M pairs), interleaved A/B in one session:
    # dedup_clusters 20.5 → 19.2 s warm (−6%; the first cold run shows
    # 29.3 → 19.9 s but that gap is JIT/page-cache bias, quoted so
    # nobody re-reports it as the win). (The half-lineage-cut that won
    # for PageRank was ALSO tried and rejected: neutral alone —
    # 26.4 s — and a 28.0 s regression combined, because three
    # consumers re-derive the uncut round.)
    # Without the cut each iteration would re-run the entire upstream
    # pair-generation pipeline (LSH bucketing, signature UDFs, ...).
    # ADVICE r8: shuffle.partitions can be non-numeric ("auto" on some
    # platforms) — fall back to defaultParallelism instead of raising,
    # and skip the explicit repartition entirely in that case (the
    # measured win of the pre-partitioned checkpoint was only ~6% warm;
    # the checkpoint's lineage cut is the load-bearing part).
    if not pre_materialized:
        try:
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            n_shuffle = None
        if n_shuffle:
            # r17: bound the width by the source corpus size (one
            # partition per ~128 KiB of leaf-scan bytes, capped at
            # n_shuffle) — a bench-scale pair graph no longer fans
            # every CC round into shuffle.partitions near-empty tasks,
            # while an input big enough to need the full width still
            # gets it. ``width`` lets a caller whose pair frame sits
            # on a cached relation (no visible leaf files) pass the
            # corpus-derived width instead; unknown sizes keep the
            # old n_shuffle.
            w = min(width, n_shuffle) if width else cpu_spread_width(pairs, n_shuffle)
            edges = edges.repartition(w, "v")
        # Local path: LAZY localCheckpoint (r17) — the cut is the
        # LogicalRDD plan truncation plus persist-once semantics, both
        # of which hold with eager=False; round 1's fingerprint action
        # materializes it, saving one standalone job per CC call. The
        # reliable path stays eager: RDD.checkpoint() recomputes the
        # lineage when materialized lazily by a consuming job.
        edges = (
            edges.checkpoint(eager=True)
            if reliable
            else edges.localCheckpoint(eager=False)
        )
    fast = _local_cc_fastpath(edges)
    if fast is not None:
        return fast
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    prev_fp = None
    for _ in range(max_iter):
        # candidate label for each node: min over (own, neighbors')
        neigh = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jumping: comp ← label[comp]. One self-join of the
        # (small) label table per round turns O(diameter) rounds into
        # O(log diameter) — chain-shaped near-dup clusters (doc A ~ B
        # ~ C ... with only adjacent pairs similar) otherwise need one
        # round PER HOP; a 20-deep chain measured 20 rounds without
        # this and 6 with it.
        jump = new_labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        new_labels = new_labels.join(jump, "comp", "left").select(
            "node", F.coalesce("comp2", "comp").alias("comp")
        )
        new_labels = (
            new_labels.checkpoint(eager=True)
            if reliable
            else new_labels.localCheckpoint(eager=False)
        )
        # Convergence = labels identical to last round. Min-label
        # propagation is monotone (labels only decrease), so a 64-bit
        # XOR fingerprint being unchanged means fixpoint (bit_xor is
        # order-independent and can't overflow under ANSI mode). One
        # tiny partial-agg scan of the checkpointed frame — no join,
        # no extra shuffle (the old per-round join+count was a full
        # driver action with a shuffle at cluster scale). r17: the
        # local checkpoint above is lazy, so THIS action materializes
        # it — one job per round instead of two.
        fp = new_labels.agg(
            F.expr("bit_xor(xxhash64(node, comp))").alias("fp")
        ).collect()[0][0]
        labels = new_labels
        if fp == prev_fp:
            break
        prev_fp = fp
    return labels.select("node", "comp")


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Full dedup resolution: candidate pairs → connected components →
    every id mapped to its cluster keeper (min id; singletons keep
    themselves). Returns (id, keeper_id, cluster_size).
    """
    from utility_service_areas_spark.operators.dedup import lineage_cut

    # The id frame is the file-backed corpus side, so it carries the
    # size signal the (often cached) pair frame hides (r17).
    comp = connected_components(
        pairs,
        a_col,
        b_col,
        width=cpu_spread_width(
            all_ids, all_ids.sparkSession.sparkContext.defaultParallelism
        ),
    )
    joined = all_ids.select(F.col(id_col).alias("node")).join(
        comp, "node", "left"
    )
    # resolved feeds BOTH the size aggregate and the final join —
    # without the cut Catalyst re-runs the ids⋈comp join for each
    # consumer (no identical-subtree reuse; measured r8). The size
    # path stays groupBy+join rather than a count-over-keeper window
    # so a giant dup cluster partial-aggregates map-side and the hot
    # probe key is AQE-skew-splittable, not a single window sort
    # partition.
    resolved = lineage_cut(
        joined.select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("comp"), F.col("node")).alias("keeper_id"),
        )
    )
    sizes = resolved.groupBy("keeper_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return resolved.join(sizes, "keeper_id").select(id_col, "keeper_id", "cluster_size")


def pagerank_micros(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank with INTEGER-micros ranks — the classic
    iterative-join Spark workload, made bit-replayable.

    Rank state is a micros-bigint (initial 1_000_000 per node);
    each round every node sends floor(rank / outdeg) to each neighbor
    (double division + floor, operand-order mirrored in the SQL
    oracle), and new_rank = floor((1-d)·1e6) + floor(d · Σ contrib).
    Integer sums are order-independent, so the trajectory is identical
    across partitionings AND engines — same discipline as the k-means
    micros centroids (operators/kmeans.py).

    Scale shape: per round ONE join of the edge list against the
    (node-sized) rank frame + one partial-aggregated groupBy on dst;
    the edge list is checkpointed once and reused. Rank state is
    node-sized, never corpus-sized. Dangling mass is dropped
    (simplified PR) — mirrored in the oracle.

    Returns (node, rank_micros) for every node appearing in edges.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    reliable = edges.sparkSession.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=False)

    # Materialize the loop-invariant frames ONCE: the edge list with
    # its out-degree fused in (saves a per-round join), and the node
    # frame (otherwise its distinct-shuffle re-runs every round).
    e = _cut(
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src")
    )
    nodes = _cut(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank_micros", F.lit(1_000_000).cast("long"))
    base = int((1.0 - damping) * 1_000_000)
    for i in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank_micros") * 1.0 / F.col("outdeg"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("sum_c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(F.lit(damping) * F.coalesce("sum_c", F.lit(0)))
                ).cast("long").alias("rank_micros"),
            )
        )
        # Lineage cut every other round: a FIXED small iteration count
        # doesn't need the per-round materialization CC's unbounded
        # loop does — each eager checkpoint costs a full job.
        if i % 2 == 1 or i == n_iter - 1:
            ranks = _cut(ranks)
    return ranks


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list — the classic graph-density kernel (a near-dup cluster's
    triangle count separates true cliques from chains; social/citation
    analytics use the same shape).

    Scale discipline: edges are ORIENTED by (degree, id) — every edge
    points from its lower-(deg, id) endpoint to the higher one — so
    each triangle is generated exactly once AND the 2-path fan-out per
    node is bounded by its out-degree under the orientation, which for
    a heavy-tailed graph moves the quadratic cost off the hub nodes
    (the standard Suri–Vassilvitskii / Cohen MapReduce trick; a hub
    with degree d contributes O(d) oriented out-edges only toward
    higher-degree nodes, of which there are few). Three hash joins,
    all partial-agg friendly; orientation is pure integer comparison,
    so the SQL oracle replays it exactly.

    Returns (node, n_triangles) for nodes in >= 1 triangle.
    """
    und = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    # Materialize the edge list and the oriented list ONCE (r8): the
    # triple self-join consumes `oriented` three times and the degree
    # join consumes `und` three times, and Catalyst does NOT reuse
    # those subtrees (0 ReusedExchange in the executed plan) — so
    # without the cut the entire upstream pair-generation pipeline
    # (minhash, banding, bucket join) re-runs per branch. Both frames
    # are edge-sized, tiny next to the doc corpus they derive from.
    # Measured at 10× interleaved A/B (warm rounds): 17.3-18.5 s →
    # 4.1 s (4.2×). Reliable checkpoint when a dir is configured
    # (cluster posture), localCheckpoint otherwise — the same
    # discipline as connected_components above.
    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=False)

    und = _cut(und)
    tri = _oriented_triangles(und, _cut)
    corners = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return corners


def _oriented_triangles(und: DataFrame, _cut, deg: DataFrame | None = None) -> DataFrame:
    """(x, y, z) rows, one per triangle, from an already-materialized
    both-directions edge list — the shared kernel of per-node
    `triangle_counts` and per-cluster `cluster_density`. ``deg`` is
    the (node, d) degree frame if the caller already has one."""
    if deg is None:
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
            "u", "node"
        )
    with_deg = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = _cut(with_deg.filter(lower_first).select("u", "v"))
    e1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    return e1.join(e2, "y").join(e3, ["x", "z"])


def cluster_density(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    width: int | None = None,
) -> DataFrame:
    """Per-CLUSTER density report over an undirected edge list: for
    every connected component, its size, edge count, triangle count,
    edge density 2E/(n(n-1)) and transitivity 3T/wedges (both
    micros-quantized) — the table curation reads to decide which
    near-dup clusters are true template cliques (collapse to one
    keeper) vs weak chains (keep and re-verify). The per-node twin is
    `triangle_counts`; aggregating per cluster collapses a k-clique's
    k output rows to ONE, so output volume tracks cluster count, not
    clique volume (VERDICT r8 task 6).

    Cost shape: the same oriented triangle kernel + one CC labeling,
    then everything aggregates on the cluster id — edge-sized frames
    throughout, partial-agg friendly. n_edges and n_wedges come from
    the degree frame alone (Σd = 2E, Σ d(d-1)/2 = wedges), no second
    edge join. Density ratios use the floor(x·1e6 + 0.5) micros rule
    with operand order mirrored in the SQL oracle.

    Returns (cluster_id, n_docs, n_edges, n_triangles,
    edge_density_micros, transitivity_micros); cluster_id is the
    component's min node id (the CC label), n_docs >= 2 always —
    isolated docs have no edges and no cluster.
    """
    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=False)

    sym = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .filter(F.col("u") != F.col("v"))
    )
    # Checkpoint PRE-PARTITIONED on v (checkpoint preserves
    # outputPartitioning): CC's per-round edge⋈label join then
    # shuffles only the node-sized label frame — skipping this and
    # letting CC take the edges unpartitioned re-shuffles the whole
    # edge list EVERY round (measured 23.5 → 27.5 s at 30× when the
    # repartition was dropped).
    try:
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_shuffle = None
    if n_shuffle:
        # Same source-size width bound as connected_components (r17).
        w = min(width, n_shuffle) if width else cpu_spread_width(pairs, n_shuffle)
        sym = sym.repartition(w, "v")
    und = _cut(sym)
    # Degree frame computed ONCE (node-sized, cut) and shared by the
    # orientation and the per-cluster stats; `und` is already
    # symmetric+distinct+partitioned+materialized, so CC adds no
    # edge-frame pass of its own (pre_materialized=True).
    deg = _cut(
        und.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
            "u", "node"
        )
    )
    tri = _oriented_triangles(und, _cut, deg)
    comp = connected_components(und, "u", "v", pre_materialized=True)
    per_node = comp.join(deg, "node")
    base = per_node.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),  # Σd = 2E, always even
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges"),
    )
    tric = (
        tri.join(comp.withColumnRenamed("node", "x"), "x")
        .groupBy("comp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    dens = F.floor(
        2.0 * F.col("n_edges") * 1000000 / (F.col("n_docs") * (F.col("n_docs") - 1))
        + 0.5
    ).cast("long")
    trans = F.when(F.col("n_wedges") == 0, F.lit(0).cast("long")).otherwise(
        F.floor(3.0 * t * 1000000 / F.col("n_wedges") + 0.5).cast("long")
    )
    return (
        base.join(tric, "comp", "left")
        .select(
            F.col("comp").alias("cluster_id"),
            "n_docs",
            "n_edges",
            t.cast("long").alias("n_triangles"),
            dens.alias("edge_density_micros"),
            trans.alias("transitivity_micros"),
        )
    )


def connected_components_twostar(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al. 2014, 'Connected Components in MapReduce and
    Beyond') — the hub-safe alternative to min-label propagation
    (``connected_components``): label propagation's per-round work is
    O(edges) for O(log d) rounds after pointer-jumping, but every
    round re-joins the FULL edge list; two-star provably SHRINKS the
    edge multiset toward stars in O(log^2 n) rounds, and on the
    high-degree near-clique graphs dedup produces, large-star
    collapses a clique to a star in ONE round — the remaining rounds
    join star-sized (node-sized) frames, not clique-edge-sized ones.

    Semantics are identical by construction — at the fixpoint every
    node is adjacent to its component minimum — and pinned
    label-identical to ``connected_components`` on chains, cliques,
    stars, and the substrate's LSH pair graph
    (tests/test_r13_operators.py).

    Each round: two groupBy-min aggregations + two node-keyed joins
    (all partial-agged, no global structure), localCheckpoint per
    round for the lineage cut, bit_xor(xxhash64) fingerprint for the
    fixpoint test (order-independent, one tiny scan).

    Returns (node, comp) for every node appearing in pairs.
    """
    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=False)
        )

    def _sym(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("u") != F.col("v"))
            .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _center_mins(e: DataFrame) -> DataFrame:
        return e.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    edges = _cut(
        _sym(pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    )
    # Same size-bounded driver fast path as connected_components —
    # two-star's labels are pinned identical to min-label propagation,
    # so the union-find answer is identical to both.
    fast = _local_cc_fastpath(edges)
    if fast is not None:
        return fast

    def _star_round(e: DataFrame) -> DataFrame:
        # LARGE-STAR: every neighbor LARGER than the center re-attaches
        # to the center's minimum (min over neighborhood + self).
        mins = _center_mins(e)
        large = (
            e.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = _cut(_sym(large))
        # SMALL-STAR: every neighbor <= the center, plus the center
        # itself, re-attaches to the center's minimum.
        mins = _center_mins(e)
        small = (
            e.join(mins, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
        return _cut(_sym(small))

    def _fingerprint(e: DataFrame) -> int:
        return e.agg(
            F.expr("bit_xor(xxhash64(u, v))").alias("fp")
        ).collect()[0][0]

    prev_fp = None
    converged = False
    for _ in range(max_iter):
        edges = _star_round(edges)
        fp = _fingerprint(edges)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        # Fingerprint equality trails the fixpoint by one round (the
        # round that REACHES it still changes the set), so a graph that
        # converges exactly at max_iter would look unconverged. Verify
        # directly with one extra round before raising — its cost is
        # one round we were about to charge to an exception anyway
        # (ADVICE r14 #3).
        edges = _star_round(edges)
        converged = _fingerprint(edges) == prev_fp
    if not converged:
        # ADVICE r13 #4: exiting by exhaustion means the edge set never
        # reached the star fixpoint — the labels below could be WRONG
        # components. This operator is sold as the trillion-edge path
        # where hitting the cap is likelier, so an unconverged result
        # must never be mistakable for a fixpoint: fail loudly and tell
        # the caller the lever.
        raise RuntimeError(
            f"connected_components_twostar did not converge within "
            f"max_iter={max_iter} rounds (edge-set fingerprint still "
            "moving) — labels would be unreliable; raise max_iter "
            "(rounds needed grow O(log^2 n))"
        )
    # Fixpoint = disjoint stars centered at component minima: each
    # node's label is min(self, min neighbor).
    return (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .select(F.col("u").alias("node"), "comp")
    )


def hits_micros(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) with INTEGER-micros
    scores — hubs on the source side, authorities on the destination
    side of a DIRECTED edge list.

    State discipline (the pagerank_micros/k-means posture, made even
    stricter): scores start at 1_000_000; each half-round is an
    integer SUM across the edge join followed by max-normalization
    back to the micros scale via EXACT INTEGER DIVISION
    ((score * 1_000_000) div max_score) — no double ever exists in
    the trajectory, so the oracle replays bit-for-bit without even
    the operand-order discipline floats need. Sums are
    order-independent by integer associativity.

    Scale shape: per half-round ONE edge⋈score join + one partial-agg
    groupBy + one 1-row max agg broadcast back; the edge list is
    checkpointed once; score state is node-sided. Overflow headroom:
    sum <= max_degree * 1e6 and the rescale multiplies by 1e6, so
    max_degree may reach ~9.2e6 before BIGINT overflow — ANSI mode
    would raise loudly, not wrap.

    Returns (node, side, score_micros): side='hub' for sources,
    'auth' for destinations.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    reliable = edges.sparkSession.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=False)
        )

    e = _cut(e)
    hubs = (
        e.select("src").distinct().withColumn("h", F.lit(1_000_000).cast("long"))
    )
    for i in range(n_iter):
        a_raw = (
            e.join(hubs, "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a_raw"))
        )
        a_max = a_raw.agg(F.max("a_raw").alias("mx"))
        auths = a_raw.crossJoin(F.broadcast(a_max)).select(
            "dst", F.expr("(a_raw * 1000000) div mx").alias("a")
        )
        h_raw = (
            e.join(auths, "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h_raw"))
        )
        h_max = h_raw.agg(F.max("h_raw").alias("mx"))
        hubs = h_raw.crossJoin(F.broadcast(h_max)).select(
            "src", F.expr("(h_raw * 1000000) div mx").alias("h")
        )
        if i % 2 == 1 or i == n_iter - 1:
            hubs = _cut(hubs)
            auths = _cut(auths)
    return hubs.select(
        F.col("src").alias("node"), F.lit("hub").alias("side"),
        F.col("h").alias("score_micros"),
    ).unionByName(
        auths.select(
            F.col("dst").alias("node"), F.lit("auth").alias("side"),
            F.col("a").alias("score_micros"),
        )
    )
