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
from utility_service_areas_spark.operators.localrel import local_df


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
    # (r17: cpu_spread on the corpus side was TRIED AND REJECTED —
    # interleaved A/B at sf0.1: width-7 1.2-2.2 s vs width-1
    # 0.7-1.6 s. Embedding rows are ~1 KB of doubles with only
    # |Q|·dim mults of fold work each — far less CPU per byte than
    # the text kernels the spread budget was tuned for, so the extra
    # tasks cost more than the parallelism buys.)
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


def lsh_plane_coeffs(dim: int, n_planes: int = 12) -> list[list[int]]:
    """Deterministic hyperplane coefficients in {-3..3}: plane p's j-th
    coefficient is md5(f"{p}:{j}") % 7 - 3. hashlib md5 is the SAME
    function DuckDB's md5() computes, so an oracle can inline these
    exact integers as list literals and reproduce every bucket bit —
    which is what graduates lsh_topk from rows-only to value-verified.
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:4], 16) % 7 - 3
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_lsh_bucket(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Deterministic random-hyperplane LSH bucket id.

    Coefficients come from `lsh_plane_coeffs` (md5-derived literals —
    no RNG state, reproducible builds, SQL-mirrorable); each plane's
    projection is the usual sequential double fold and the bucket is
    the sign-bit string of the projections.
    """
    coeffs = lsh_plane_coeffs(dim, n_planes)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in coeffs[p]]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bit_flip(bucket: Column, i: int, n_planes: int) -> Column:
    """The bucket string with bit i inverted (multi-probe neighbor)."""
    flipped = F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(
        F.lit("1")
    )
    return F.concat(
        F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, n_planes)
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k via MULTI-PROBE hyperplane LSH: each query
    probes its own bucket plus every Hamming-1 neighbor bucket
    (n_planes+1 probes — the standard recall fix for sign-LSH: a
    near neighbor differs in at most a marginal projection sign far
    more often than in two), then exact cosine rerank over the probed
    candidates. At 100 TB the probe join replaces the full scan per
    query; recall vs brute force is property-tested
    (tests/test_dedup.py). Deterministic end-to-end (md5-derived
    planes), so the whole path is value-oracled in SQL.
    """
    bucket = hyperplane_lsh_bucket(F.col(vec_col), dim, n_planes)
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2_expr(F.col(vec_col)).alias("c_n"),
        bucket.alias("bucket"),
    )
    probes = F.array(
        F.col("bucket"),
        *[_bit_flip(F.col("bucket"), i, n_planes) for i in range(n_planes)],
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm2_expr(F.col(vec_col)).alias("q_n"),
            bucket.alias("bucket"),
        )
        # probes are pairwise distinct and a neighbor has ONE bucket,
        # so the equi-join below cannot duplicate a candidate pair.
        .select(
            "query_id", "q_vec", "q_n", F.explode(probes).alias("bucket")
        )
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


def _numpy_assign_top1(
    df: DataFrame, out_id: str, vec_col: str, cents_rows: list
) -> DataFrame:
    """Blocked-numpy corpus→cell assignment: the O(n·C·d) bound of IVF
    as ~d vectorized ops per Arrow batch instead of n·C interpreted
    JVM folds. Bitwise identical to the max_by path: the dot product
    accumulates SEQUENTIALLY over dimensions (vectorized over the
    batch×centroid plane), so every double equals the JVM left-to-right
    fold; np.argmax returns the FIRST max index and the centroid
    columns are sorted by cent_id asc, so ties break exactly like
    (score desc, cent_id asc). Same pattern that won 43× for
    embedding_cosine_pairs (BENCH_TREND r5).

    ``cents_rows``: collected (cent_id, cent_vec, cent_n) rows — k×dim
    driver state only, shipped to executors in the task closure.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    rows = sorted(cents_rows, key=lambda r: r["cent_id"])
    cids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["cent_vec"] for r in rows], dtype=np.float64)  # C×d
    cnorm = np.array([r["cent_n"] for r in rows], dtype=np.float64)

    out_schema = StructType(
        [
            StructField(out_id, df.schema[out_id].dataType),
            StructField(vec_col, df.schema[vec_col].dataType),
            StructField("cell", LongType()),
        ]
    )

    def assign_batches(batches):
        for pdf in batches:
            vec = pdf[vec_col]
            ok = vec.map(lambda v: v is not None and len(v) == cmat.shape[1])
            sub = pdf[ok]
            if len(sub):
                X = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
                acc = np.zeros((len(X), len(cids)))
                for j in range(cmat.shape[1]):  # sequential over dims == JVM fold
                    acc += X[:, j][:, None] * cmat[:, j][None, :]
                scores = acc / cnorm[None, :]
                cell = cids[np.argmax(scores, axis=1)]
                yield pd.DataFrame(
                    {
                        out_id: sub[out_id].to_numpy(),
                        vec_col: sub[vec_col].to_numpy(),
                        "cell": cell,
                    }
                )

    return df.select(out_id, vec_col).mapInPandas(assign_batches, out_schema)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroid_stride: int = 37,
    assign_via: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every vector
    to its nearest centroid cell; queries probe only their n_probe
    nearest cells and rerank exactly inside them.

    Centroids are a deterministic corpus sample (every
    ``centroid_stride``-th id, capped at n_centroids) — no RNG, so
    builds are reproducible. At 100 TB the assignment pass is one
    broadcast scan (n·C dot products), the probe join shuffles on
    the cell id, and per-cell candidate lists are ~n/C — the classic
    IVF trade of recall for a C/n_probe-fold scan reduction.

    Assignment ranks by dot/|centroid| — |v| is constant across a
    vector's centroid comparisons, so the argmax is identical to full
    cosine at a third of the fold work — and the corpus top-1 cell is
    a partial-aggregatable max_by, not a per-vector window sort (the
    window shuffled+sorted n·C rows; max_by combines map-side).

    Rows whose vector is null or dimension-mismatched vs the centroids
    are dropped from assignment on EVERY kernel (see ``well_formed``
    below) — the kernel choice never changes the returned row set.

    ``assign_via``: 'jvm' keeps the whole-stage-codegen max_by fold,
    'numpy' routes the O(n·C) corpus assignment through the blocked
    Arrow kernel (_numpy_assign_top1 — bitwise-equal scores, pinned by
    tests/test_dedup.py::test_ivf_numpy_assign_matches_jvm), 'auto'
    picks numpy once n_centroids ≥ 64 — the real-ANN regime C ≈ √n
    where the interpreted fold becomes the bound (BENCH_TREND r7:
    1M×64 vectors at C=1000).
    """
    c_assigned, q_assigned = ivf_assignments(
        vectors,
        queries,
        id_col,
        vec_col,
        n_centroids,
        n_probe,
        centroid_stride,
        assign_via,
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


def ivf_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroid_stride: int = 37,
) -> DataFrame:
    """The IVF coarse-quantizer centroid frame alone: a deterministic
    corpus sample (every ``centroid_stride``-th id, capped), as
    (cent_id, cent_vec, cent_n). Shared by ivf_assignments and the
    residual-PQ encoder, which subtracts these centroids."""
    return (
        vectors.filter(F.col(id_col) % centroid_stride == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            norm2_expr(F.col(vec_col)).alias("cent_n"),
        )
        # A zero-norm sampled centroid would make cent_score NaN, and
        # Spark sorts NaN greatest — max_by would hand EVERY vector to
        # the degenerate cell, silently collapsing recall.
        .filter(F.col("cent_n") > 0)
    )


def ivf_assignments(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroid_stride: int = 37,
    assign_via: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """The coarse-quantizer stage of ivf_topk alone: corpus rows
    assigned to their top-1 cell as (neighbor_id, c_vec, c_n, cell),
    queries to their n_probe cells as (query_id, q_vec, q_n, cell).
    Shared by plain IVF and the IVF+PQ composed index."""
    if assign_via not in ("auto", "jvm", "numpy"):
        raise ValueError(f"assign_via must be auto|jvm|numpy, got {assign_via!r}")
    use_numpy = assign_via == "numpy" or (assign_via == "auto" and n_centroids >= 64)
    cents = ivf_centroids(vectors, id_col, vec_col, n_centroids, centroid_stride)
    cent_score = dot_expr(F.col(vec_col), F.col("cent_vec")) / F.col("cent_n")

    # Malformed-vector contract (ADVICE r7): rows whose vector is null
    # or dimension-mismatched vs the centroids are DROPPED from
    # assignment, identically on every kernel. The numpy kernel skips
    # them by construction; the JVM paths filter here so assign_via /
    # the auto threshold can never change the returned row set
    # (pinned by tests/test_dedup.py::test_ivf_malformed_vectors_
    # dropped_on_both_paths).
    well_formed = F.col(vec_col).isNotNull() & (
        F.size(F.col(vec_col)) == F.size(F.col("cent_vec"))
    )

    def assign_top1(df: DataFrame, out_id: str) -> DataFrame:
        if use_numpy:
            return _numpy_assign_top1(df, out_id, vec_col, cents.collect())
        scored = (
            df.crossJoin(F.broadcast(cents))
            .filter(well_formed)
            .withColumn("cent_score", cent_score)
        )
        # argmax by (score desc, cent_id asc) == max_by over the
        # lexicographic struct (score, -cent_id)
        return scored.groupBy(out_id).agg(
            F.any_value(F.col(vec_col)).alias(vec_col),
            F.max_by(
                F.col("cent_id"), F.struct(F.col("cent_score"), -F.col("cent_id"))
            ).alias("cell"),
        )

    def assign(df: DataFrame, out_id: str, top: int) -> DataFrame:
        if top == 1:
            return assign_top1(df, out_id)
        scored = (
            df.crossJoin(F.broadcast(cents))
            .filter(well_formed)
            .withColumn("cent_score", cent_score)
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("cent_score").desc(), F.col("cent_id").asc()
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
    return c_assigned, q_assigned


def embedding_cosine_pairs(
    vectors: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_micros: int = 400_000,
) -> DataFrame:
    """Near-duplicate pairs by cosine within a bucketing column (e.g.
    a cluster label or LSH bucket) — never a full cross join.

    Plan: one shuffle on the bucket key, then a BLOCKED all-pairs
    numpy kernel per bucket (applyInPandas). The kernel accumulates
    the dot product SEQUENTIALLY over dimensions (vectorized over
    pairs), so every double — and its micros rounding — is bitwise
    identical to the JVM left-to-right fold (dot_expr) the SQL oracle
    mirrors. The earlier per-pair JVM fold was interpreted expression
    evaluation: O(pairs·dim) interpreter steps, measured 176 s at 10×
    substrate (tools/stress.py, BENCH_TREND.md); the blocked kernel
    does the same arithmetic as ~dim numpy array ops per block.

    Scale posture: work is O(B²·d) per bucket — inherent to the exact
    all-pairs semantics — at numpy speed, with O(block·B) memory. A
    bucket too hot for one task should be sub-bucketed upstream
    (hyperplane_lsh_bucket as the bucket_col), trading exactness for
    recall like every ANN path. Pairs whose vectors differ in length
    or contain nulls are dropped, matching the JVM fold's null
    semantics.

    Returns (id_a, id_b, sim_micros) for sim ≥ threshold, id_a < id_b.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", vectors.schema[id_col].dataType),
            StructField("id_b", vectors.schema[id_col].dataType),
            StructField("sim_micros", LongType()),
        ]
    )

    def _half_up(v: "np.ndarray") -> "np.ndarray":
        # F.round / DuckDB round: HALF_UP away from zero (numpy's
        # default round is banker's — wrong at .5 boundaries).
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    def pairs_in_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[vec_col].notna()]
        out_a, out_b, out_s = [], [], []
        # JVM zip_with over unequal lengths nulls the sum → such pairs
        # are filtered; grouping by length reproduces that exactly.
        for _, sub in pdf.groupby(pdf[vec_col].map(len)):
            ids = sub[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            X = np.stack(sub[vec_col].to_numpy()[order]).astype(np.float64)
            n, d = X.shape
            if n < 2:
                continue
            norms = np.zeros(n)
            for k in range(d):  # sequential over dims == the JVM fold
                norms = norms + X[:, k] * X[:, k]
            norms = np.sqrt(norms)
            block = max(1, min(1024, 10_000_000 // max(n, 1)))
            for i0 in range(0, n, block):
                i1 = min(i0 + block, n)
                dot = np.zeros((i1 - i0, n))
                for k in range(d):
                    dot += X[i0:i1, k][:, None] * X[:, k][None, :]
                v = dot / (norms[i0:i1][:, None] * norms[None, :]) * 1_000_000.0
                with np.errstate(invalid="ignore"):
                    sim = _half_up(v)
                    # id-based upper triangle == the JVM id_a < id_b
                    # filter (tie ids pair with nothing, as there).
                    ii, jj = np.nonzero(
                        (sim >= threshold_micros)
                        & (ids[None, :] > ids[i0:i1][:, None])
                    )
                out_a.append(ids[ii + i0])
                out_b.append(ids[jj])
                out_s.append(sim[ii, jj].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim_micros": []}).astype(
                {"sim_micros": "int64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "sim_micros": np.concatenate(out_s),
            }
        )

    return (
        vectors.select(F.col(id_col), F.col(vec_col), F.col(bucket_col))
        # SQL join-on-key semantics: a NULL bucket matches nothing, but
        # groupBy would happily pair the whole NULL group with itself.
        .filter(F.col(bucket_col).isNotNull())
        .groupBy(bucket_col)
        .applyInPandas(pairs_in_bucket, out_schema)
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    expected_dim: int | None = None,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"): split each vector into ``m`` contiguous
    subvectors, fit an independent k-means codebook per subspace
    (md5-seeded, micros-BIGINT centroid sums — the same bit-replayable
    trajectory as operators/kmeans.py), and encode every vector as m
    small code indices. Returns (codes frame (id, code_0..code_{m-1}),
    codebooks[m][k][sub_dim]).

    Scale shape: the m fits touch only k×sub_dim driver state each;
    the ENCODE is one fused mapInPandas pass — every subspace argmin
    runs on the same Arrow batch, so the corpus is scanned once, not m
    times, and the output is m ints per vector (a 64-dim float64 row
    compresses 128 bytes → 4 codes). The per-subspace argmin reuses
    kmeans' `_np_assign` (sequential-fold distance, first-min
    tiebreak), so an unrolled SQL replay verifies assignments exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from utility_service_areas_spark.operators.kmeans import (
        _np_assign,
        fit_centroids_np_multi,
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if expected_dim is not None:
        dim = expected_dim
        if base.filter(F.col("vec").isNotNull()).first() is None:
            raise ValueError("pq_encode: empty input")
    else:
        # Corpus dimensionality = the MODAL vector size (count DESC,
        # size ASC tiebreak), not the first non-null row's — a
        # malformed FIRST row (ADVICE r10) would otherwise silently
        # define dim and drop the entire clean corpus, or raise on
        # dim % m. One extra size-only agg over the pruned vec column;
        # callers that know the schema pass expected_dim and skip it.
        mode = (
            base.filter(F.col("vec").isNotNull())
            .groupBy(F.size("vec").alias("d"))
            .count()
            .orderBy(F.col("count").desc(), F.col("d"))
            .first()
        )
        if mode is None:
            raise ValueError("pq_encode: empty input")
        dim = mode.d
    # Malformed-vector contract (ADVICE r9, same posture as
    # ivf_assignments): null or wrong-cardinality embeddings are
    # dropped up front — np.stack in the fused fit+encode pass
    # requires every Arrow-batch row to be a non-null fixed-dim
    # vector, and one ragged row would otherwise crash the whole fit.
    base = base.filter(F.col("vec").isNotNull() & (F.size("vec") == dim))
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # r9: all m subspace fits fused into one corpus pass per round
    # (was m independent fits = m x (n_iter + 1) passes); codebooks
    # bit-identical (tests/test_ann_kernels.py), so the per-subspace
    # SQL replay chains verify the fused path unchanged.
    books = fit_centroids_np_multi(base, k, n_iter, m)

    schema = StructType(
        [StructField("id", LongType())]
        + [StructField(f"code_{s}", LongType()) for s in range(m)]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            cols = {"id": pdf["id"].to_numpy()}
            for s in range(m):
                cl, _ = _np_assign(X[:, s * sub : (s + 1) * sub], books[s])
                cols[f"code_{s}"] = cl
            yield pd.DataFrame(cols)

    return base.mapInPandas(encode, schema), books


def nn_descent_graph(
    emb: DataFrame,
    k: int = 10,
    rounds: int = 3,
    n_init: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN graph by NN-descent (Dong, Moses & Li, WWW'11)
    in pure DataFrame algebra — FIXED rounds, fully deterministic, so a
    SQL oracle can replay every round bit-for-bit.

    Init: for each vector, up to ``n_init`` md5-seeded candidates
    (('0x'||md5(vid:j))::BIGINT % n — the repo's integer-hash seam;
    duplicates/self collapse, top-k survive). Each round applies the
    NN-descent step: the undirected neighborhood U = out-edges ∪
    reverse edges CAPPED at k per head (deterministic (sim DESC, id)
    rank — the cap bounds hub blow-up, candidates per vertex stay
    O(k²)), candidate set = U ∘ U (neighbors of neighbors) ∪ U, then
    re-select top-k by cosine. Cosine is the shared sequential-fold
    dot (dot_expr) with per-row precomputed norms — bitwise equal to
    the oracle's inline form (see _paired_sim_micros).

    Scale: every shuffle is keyed (vertex id); per-round state is the
    k-regular edge list (n·k rows) lineage_cut (it feeds the reverse
    cap, the closure AND the union); candidate volume is bounded by
    the reverse cap, never by hub degree. No collect of anything
    data-sized, no Python in any hot path."""
    from utility_service_areas_spark.operators.dedup import lineage_cut

    from utility_service_areas_spark.operators.suffix import (
        dense_rank_banded,
    )

    vecs = lineage_cut(
        emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            norm2_expr(F.col(vec_col)).alias("nrm"),
        )
    )
    # md5-seeded init picks a POSITION 0..n-1, mapped to an actual id
    # through a dense index — ids need not be contiguous or 0-based
    # (an offset/sparse id space would otherwise silently lose every
    # init candidate in the join). min/max/total are bounded driver
    # scalars; the index itself is a banded dense rank (keyed windows,
    # never a single reducer).
    bounds = vecs.agg(
        F.min("vid").alias("lo"), F.max("vid").alias("hi")
    ).first()
    if bounds.lo is None:  # empty corpus -> empty graph, typed
        return local_df(emb.sparkSession, 
            [],
            f"{id_col} long, neighbor_id long, rank long, sim_micros long",
        )
    span = max(int(bounds.hi) - int(bounds.lo) + 1, 1)
    band = F.expr(
        f"CAST((vid - {int(bounds.lo)}) * 256 AS BIGINT) div {span}"
    )
    ranked, n_total = dense_rank_banded(vecs.select("vid"), ["vid"], band)
    idx_map = ranked.select(
        (F.col("rk") - 1).alias("idx"), F.col("vid").alias("dst")
    )

    def score_topk(pairs: DataFrame) -> DataFrame:
        a = vecs.select(
            F.col("vid").alias("src"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        b = vecs.select(
            F.col("vid").alias("dst"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        scored = (
            pairs.join(a, "src")
            .join(b, "dst")
            .select(
                "src",
                "dst",
                F.round(
                    dot_expr(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb"))
                    * 1_000_000
                )
                .cast("long")
                .alias("sim_micros"),
            )
        )
        w = Window.partitionBy("src").orderBy(
            F.col("sim_micros").desc(), F.col("dst").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )

    init = (
        vecs.select("vid")
        .select(
            "vid",
            F.explode(F.sequence(F.lit(1), F.lit(n_init))).alias("j"),
        )
        .select(
            F.col("vid").alias("src"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("vid"), F.col("j"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.lit(max(n_total, 1))
            ).alias("idx"),
        )
        .join(idx_map, "idx")
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
    )
    edges = score_topk(init)
    for _ in range(rounds):
        edges = lineage_cut(edges)
        wrev = Window.partitionBy("dst").orderBy(
            F.col("sim_micros").desc(), F.col("src").asc()
        )
        rev = (
            edges.withColumn("rr", F.row_number().over(wrev))
            .filter(F.col("rr") <= k)
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        undirected = lineage_cut(
            edges.select("src", "dst").unionAll(rev).distinct()
        )
        cand = (
            undirected.alias("x")
            .join(
                undirected.alias("y"),
                F.col("x.dst") == F.col("y.src"),
            )
            .select(
                F.col("x.src").alias("src"), F.col("y.dst").alias("dst")
            )
            .filter(F.col("src") != F.col("dst"))
            .unionAll(undirected)
            .distinct()
        )
        edges = score_topk(cand)
    return edges.select(
        F.col("src").alias(id_col),
        F.col("dst").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
        "sim_micros",
    )
