"""Distributed Lloyd's k-means over an embedding column — the
clustering step training-data pipelines use for curation (domain
balancing, dedup-by-cluster, coreset selection).

Spark-first shape per iteration:
  1. assignment: centroids broadcast as a literal array expression;
     the distance argmin is pure JVM (`aggregate` over a zipped
     array) — the corpus is never shuffled.
  2. update: per-dimension partial-agged sums via posexplode →
     groupBy(cluster, dim) — the same numerator plan as
     `embedding_centroid_by_label`; only k×dim rows reach the driver
     to build the next broadcast.

Determinism: init picks the k vectors with the smallest md5(vec_id) —
seedless, stable across runs/partitionings. Convergence is fixed
`n_iter` (k-means cost is monotone non-increasing; tests pin it) —
at 100 TB you run few iterations over a sample, then one assignment
pass over the corpus, exactly this operator's shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2_expr(vec_col: str, centroid: list[float]) -> F.Column:
    """Squared L2 distance vec↔centroid, JVM-side: zip_with + aggregate
    (sequential double fold, deterministic)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    # argmin via array_position of the min: first match wins, so ties
    # break toward the lowest cluster index — deterministic.
    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    return (
        df.withColumn("__d", dists)
        .withColumn(
            "cluster",
            (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1).cast("long"),
        )
        .drop("__d")
    )


def kmeans_fit_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """(id, cluster, dist2_micros) after n_iter Lloyd rounds.

    Each round runs ONE distributed agg; centroid state (k×dim
    doubles) is the only data that ever reaches the driver.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    seeds = (
        base.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h")
        .limit(k)
        .select("vec")
        .collect()
    )
    centroids = [list(r.vec) for r in seeds]
    for _ in range(n_iter):
        assigned = _assign(base, "vec", centroids)
        # Per-dim sums are micros-BIGINTS, not doubles: integer addition
        # is order-independent, so the next centroid is bit-identical
        # regardless of partial-agg combine order — which makes the
        # whole fit replayable (run-to-run AND by the SQL oracle).
        stats = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.round(F.col("x") * 1_000_000).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        counts: dict[int, int] = {}
        for r in stats:
            by_cluster.setdefault(r.cluster, {})[r.dim] = r.s
            counts[r.cluster] = r.n
        for ci in range(len(centroids)):
            if ci in by_cluster:
                dims = by_cluster[ci]
                centroids[ci] = [
                    (dims[d] / 1_000_000.0) / counts[ci]
                    for d in range(len(centroids[ci]))
                ]
            # empty cluster keeps its previous centroid
    final = _assign(base, "vec", centroids)
    mind = F.array_min(F.array(*[_dist2_expr("vec", c) for c in centroids]))
    return final.select(
        "id",
        "cluster",
        F.round(mind * 1_000_000).cast("long").alias("dist2_micros"),
    )


def kmeans_cost(assigned_with_dist: DataFrame) -> float:
    """Total within-cluster squared distance (micros units)."""
    return assigned_with_dist.agg(F.sum("dist2_micros")).collect()[0][0]
