"""SURVEY.md §2.5 — multimodal pipeline queries on the documents
table (text bytes stand in for media blobs; see operators/multimodal).
The md5-derived fake decode is exactly mirrorable in SQL, so the
whole decode→sample pipeline gets a value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utility_service_areas_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from utility_service_areas_spark.plans.registry import query
from utility_service_areas_spark.sources.tables import load_table
from utility_service_areas_spark.operators.localrel import local_df

_META_SQL = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'video/mp4' END AS mime,
           CAST(1 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS INT) AS width,
           CAST(1 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                     ELSE 1 + ('0x' || substr(md5(text), 9, 4))::BIGINT % 60000
                END AS INT) AS duration_ms
    FROM documents
"""


@query(
    "multimodal_decode_meta",
    oracle=f"SELECT doc_id, mime, width, height, duration_ms FROM ({_META_SQL})",
    doc="Binary media column + Arrow-batched decode to typed metadata "
    "(decode stubbed deterministically — md5-derived dims — with the "
    "real UDF plumbing; swap fake_decode_meta for PIL at deploy).",
    tags=("multimodal",),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, "doc_id", "text")
    decoded = decode_media(media)
    return decoded.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, unnest(generate_series(0, duration_ms - 1, 5000)) AS frame_ts_ms
    FROM ({_META_SQL}) WHERE mime LIKE 'video%'
    """,
    doc="Video frame sampling as plan logic (sequence+explode on "
    "metadata; bytes untouched — Catalyst prunes the binary column).",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(docs, "doc_id", "text"))
    return sample_frames(decoded, every_ms=5000)


@query(
    "multimodal_features",
    # The fake featurizer is md5-byte arithmetic, so it IS SQL-mirrorable:
    # f0 = (digest_byte0 - 128)/128 is k·2⁻⁷ (exact in float32 AND in
    # DuckDB's double), and ×1000 stays exact, so the rounded milli
    # value matches bit-for-bit. dim is the fixed FEATURE_DIM.
    oracle="""
    SELECT doc_id,
           CAST(ROUND(((('0x' || substr(md5(text), 1, 2))::BIGINT - 128)
                       / 128.0) * 1000) AS BIGINT) AS f0_milli,
           CAST(8 AS BIGINT) AS dim
    FROM documents
    """,
    doc="Feature extraction: media bytes → fixed-dim embedding column "
    "(mapInPandas; a model inference batch at deploy). The md5 fake "
    "is value-level SQL-mirrored (was rows-only until r6).",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, "doc_id", "text")
    out = extract_features(media)
    return out.select(
        "doc_id",
        F.round(F.element_at("features", 1) * 1000).cast("long").alias("f0_milli"),
        F.size("features").cast("long").alias("dim"),
    )


@query(
    "multimodal_dedup_bytes",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'video/mp4' END AS mime,
           md5(text) AS byte_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_dups,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY mime, byte_hash
    """,
    doc="Binary-content dedup per modality: md5 of the media bytes "
    "(computed JVM-side on the binary column — bytes never reach "
    "Python), grouped within mime type; keeper = min id, byte volume "
    "audited. The md5-groupBy is one shuffle of (hash, id, size) "
    "tuples — blob bytes stay at the scan and never shuffle, the "
    "property that makes image-corpus dedup feasible at 100 TB.",
    tags=("multimodal", "dedup"),
)
def multimodal_dedup_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, "doc_id", "text")
    return (
        media.select(
            "doc_id",
            "mime",
            F.md5("media_bytes").alias("byte_hash"),
            F.octet_length("media_bytes").alias("nbytes"),
        )
        .groupBy("mime", "byte_hash")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
        )
    )


# Canonical aspect buckets (name, bw, bh) + the exact-integer nearest-
# ratio metric: |w/h - bw/bh| compared across buckets by clearing both
# denominators — metric = |w*bh - h*bw| * (144 / bh), 144 = lcm of the
# bucket heights {1,3,4,9,16}. Pure BIGINT, no float ratio anywhere.
_ASPECT_BUCKETS = (
    ("1:1", 1, 1),
    ("4:3", 4, 3),
    ("3:4", 3, 4),
    ("16:9", 16, 9),
    ("9:16", 9, 16),
)
_ASPECT_LCM = 144


@query(
    "multimodal_aspect_buckets",
    oracle=f"""
    WITH meta AS ({_META_SQL}),
    buckets(bidx, bucket, bw, bh) AS (VALUES
      {", ".join(f"({i}, '{n}', {bw}, {bh})" for i, (n, bw, bh) in enumerate(_ASPECT_BUCKETS))}),
    assigned AS (
      SELECT doc_id, bucket, width, height,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY abs(width * bh - height * bw) * ({_ASPECT_LCM} // bh),
                        bidx) AS rk
      FROM meta JOIN buckets ON true
      WHERE mime LIKE 'image%')
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(width * height) AS BIGINT) AS total_pixels,
           CAST(min(doc_id) AS BIGINT) AS sample_doc_id
    FROM assigned WHERE rk = 1 GROUP BY bucket
    """,
    doc="Aspect-ratio bucketing for image-batch training (the "
    "SDXL-style move: batches mix only images of one aspect bucket, "
    "so the loader needs the per-bucket manifest): every image maps "
    "to the NEAREST canonical ratio of {1:1, 4:3, 3:4, 16:9, 9:16} "
    "under an exact-integer metric — |w/h - bw/bh| with both "
    "denominators cleared (|w*bh - h*bw| * lcm/bh), ties to the "
    "canonical order — then per-bucket image counts + pixel volume "
    "(the batch-cost proxy). Dims come from the decode seam's "
    "md5-derived fake (the #47/#49 posture: plumbing + arithmetic "
    "real and SQL-mirrored; swap PIL in at deploy). Scale: the "
    "5-row bucket dim broadcasts, assignment is map-side (5x row "
    "expansion before a keyed min), the only shuffle is the 5-key "
    "final agg; bytes never leave the scan.",
    tags=("multimodal",),
)
def multimodal_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(docs, "doc_id", "text"))
    imgs = decoded.filter(F.col("meta.mime").startswith("image")).select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
    )
    buckets = local_df(spark, 
        [
            (i, name, bw, bh, _ASPECT_LCM // bh)
            for i, (name, bw, bh) in enumerate(_ASPECT_BUCKETS)
        ],
        "bidx int, bucket string, bw long, bh long, scale long",
    )
    metric = (
        F.abs(F.col("width") * F.col("bh") - F.col("height") * F.col("bw"))
        * F.col("scale")
    )
    w = Window.partitionBy("doc_id").orderBy(metric.asc(), F.col("bidx").asc())
    assigned = (
        imgs.join(F.broadcast(buckets))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.sum(F.col("width") * F.col("height")).cast("long").alias("total_pixels"),
        F.min("doc_id").cast("long").alias("sample_doc_id"),
    )
