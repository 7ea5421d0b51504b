"""Similarity search over embedding columns (SURVEY.md §2.4):
brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane-LSH bucketed variant as the 100 TB scale path.

Float discipline: the dot product is a left-to-right fold in DOUBLE
(`F.aggregate`), which makes the value bit-reproducible and exactly
mirrorable by an equivalent sequential fold in the DuckDB oracle.
Similarities leave the operator as micros-bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential double-precision fold of the element products.

    SQL mirror: list_sum(list_transform(generate_series(1, len(a)),
    i -> a[i]::DOUBLE * b[i]::DOUBLE)).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_micros(a: Column, b: Column) -> Column:
    return F.round(dot_expr(a, b) / (norm2_expr(a) * norm2_expr(b)) * 1_000_000).cast(
        "long"
    )


def _paired_sim_micros() -> Column:
    """Cosine from a pairwise dot and per-row precomputed norms.

    The norms are evaluated once per row BEFORE the join instead of
    once per pair — 3× less fold work — and are the same expression
    tree, so the resulting double (and its micros rounding) is
    bitwise identical to the inline form the SQL oracle mirrors.
    """
    return F.round(
        dot_expr(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n")) * 1_000_000
    ).cast("long")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — the corpus is never shuffled, each partition scores its
    rows and the TopK folds per-partition then globally (window on the
    tiny query key space).

    Returns (query_id, neighbor_id, rank, sim_micros).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_expr(F.col(vec_col)).alias("q_n"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_expr(F.col(vec_col)).alias("c_n"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_micros", _paired_sim_micros())
        .select("query_id", "neighbor_id", "sim_micros")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micros").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_micros")
    )


def hyperplane_lsh_bucket(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Deterministic random-hyperplane LSH bucket id.

    Plane p's j-th coefficient is a pseudo-random ±1/±3 value derived
    from md5(p:j) via Spark's JVM-side hash — here we use
    (hash(p, j) % 7 - 3) so the whole bucketing stays in codegen with
    no Python and no RNG state. Bucket = sign-bit string of the
    projections.
    """
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x.cast("double")
                * ((F.hash(F.lit(p), j) % 7).cast("double") - F.lit(3.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket,
    then exact cosine rerank inside the bucket. At 100 TB the bucket
    join replaces the full scan per query; recall vs brute force is
    property-tested (tests/test_dedup.py).
    """
    bucket = hyperplane_lsh_bucket(F.col(vec_col), dim, n_planes)
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_expr(F.col(vec_col)).alias("c_n"),
        bucket.alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2_expr(F.col(vec_col)).alias("q_n"),
        bucket.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_micros", _paired_sim_micros())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micros").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_micros")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroid_stride: int = 37,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every vector
    to its nearest centroid cell; queries probe only their n_probe
    nearest cells and rerank exactly inside them.

    Centroids are a deterministic corpus sample (every
    ``centroid_stride``-th id, capped at n_centroids) — no RNG, so
    builds are reproducible. At 100 TB the assignment pass is one
    broadcast scan (n·C JVM dot products), the probe join shuffles on
    the cell id, and per-cell candidate lists are ~n/C — the classic
    IVF trade of recall for a C/n_probe-fold scan reduction.
    """
    cents = (
        vectors.filter(F.col(id_col) % centroid_stride == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )

    def assign(df: DataFrame, out_id: str, top: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "cent_sim", cosine_micros(F.col(vec_col), F.col("cent_vec"))
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("cent_sim").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("cell_rank", F.row_number().over(w))
            .filter(F.col("cell_rank") <= top)
            .select(out_id, vec_col, F.col("cent_id").alias("cell"))
        )

    c_assigned = assign(
        vectors.select(F.col(id_col).alias("neighbor_id"), vec_col), "neighbor_id", 1
    ).select(
        "neighbor_id",
        F.col(vec_col).alias("c_vec"),
        norm2_expr(F.col(vec_col)).alias("c_n"),
        "cell",
    )
    q_assigned = assign(
        queries.select(F.col(id_col).alias("query_id"), vec_col), "query_id", n_probe
    ).select(
        "query_id",
        F.col(vec_col).alias("q_vec"),
        norm2_expr(F.col(vec_col)).alias("q_n"),
        "cell",
    )

    scored = (
        c_assigned.join(q_assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_micros", _paired_sim_micros())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micros").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_micros")
    )


def embedding_cosine_pairs(
    vectors: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_micros: int = 400_000,
) -> DataFrame:
    """Near-duplicate pairs by cosine within a bucketing column (e.g.
    a cluster label or LSH bucket) — never a full cross join.

    Returns (id_a, id_b, sim_micros) for sim ≥ threshold.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("q_vec"),
        norm2_expr(F.col(vec_col)).alias("q_n"),
        F.col(bucket_col).alias("bk"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("c_vec"),
        norm2_expr(F.col(vec_col)).alias("c_n"),
        F.col(bucket_col).alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim_micros", _paired_sim_micros())
        .filter(F.col("sim_micros") >= threshold_micros)
        .select("id_a", "id_b", "sim_micros")
    )
