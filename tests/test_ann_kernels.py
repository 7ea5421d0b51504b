"""Blocked-numpy kernel equality pins: the vectorized scale paths must
be BITWISE-equal to their JVM-fold references — identical fp order
(sequential over dimensions), identical tie-breaks, identical
half-away-from-zero micros — so swapping kernels can never change a
driver hash. IVF's twin pin lives in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmeans_numpy_path_matches_jvm(spark):
    from utility_service_areas_spark.operators.kmeans import (
        kmeans_fit_assign,
        kmeans_fit_assign_np,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    jvm = {
        r.id: (r.cluster, r.dist2_micros)
        for r in kmeans_fit_assign(emb, "vec_id", "embedding", k=8, n_iter=5).collect()
    }
    np_ = {
        r.id: (r.cluster, r.dist2_micros)
        for r in kmeans_fit_assign_np(
            emb, "vec_id", "embedding", k=8, n_iter=5
        ).collect()
    }
    assert jvm == np_


def test_kmeans_numpy_path_repartition_invariant(spark):
    """Same contract the JVM path pins: integer micros sums make the
    centroid trajectory independent of partitioning/batching."""
    from utility_service_areas_spark.operators.kmeans import kmeans_fit_assign_np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        r.id: (r.cluster, r.dist2_micros)
        for r in kmeans_fit_assign_np(emb, "vec_id", "embedding", k=8, n_iter=3).collect()
    }
    b = {
        r.id: (r.cluster, r.dist2_micros)
        for r in kmeans_fit_assign_np(
            emb.repartition(7, F.col("vec_id")), "vec_id", "embedding", k=8, n_iter=3
        ).collect()
    }
    assert a == b
