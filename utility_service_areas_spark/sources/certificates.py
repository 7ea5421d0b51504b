"""Certificates-list CSV source.

Parity: fetch_certificates_list output CSV (reference
R/functions.R:23-75; columns certificate_number, certificate_type,
entity, certificate_name, utility_type, certificate_status, cpcn_url,
entity_url) and its post-scrape cleanup: dedupe by certificate number
keeping the first row, drop rows with unparseable numbers, blank-fill
NAs. The scrape itself is a network concern outside the engine; this
source owns everything after bytes land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from utility_service_areas_spark.operators.relational import dedup_first_per_key

CERTIFICATES_CSV_SCHEMA = StructType(
    [
        StructField("certificate_number", StringType()),  # parsed after cleanup
        StructField("certificate_type", StringType()),
        StructField("entity", StringType()),
        StructField("certificate_name", StringType()),
        StructField("utility_type", StringType()),
        StructField("certificate_status", StringType()),
        StructField("cpcn_url", StringType()),
        StructField("entity_url", StringType()),
    ]
)


def read_certificates_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, schema=CERTIFICATES_CSV_SCHEMA)


def clean_certificates(df: DataFrame) -> DataFrame:
    """Mirror of the reference cleanup (R/functions.R:55-67):
    numeric-parse the certificate number (dropping unparseable rows),
    dedupe keeping the first row per number, blank-fill nulls.
    """
    parsed = df.withColumn(
        "certificate_number", F.col("certificate_number").try_cast("double")
    ).filter(F.col("certificate_number").isNotNull())
    deduped = dedup_first_per_key(
        parsed,
        ["certificate_number"],
        [F.col("certificate_name"), F.col("cpcn_url")],
    )
    text_cols = [c for c in deduped.columns if c != "certificate_number"]
    filled = deduped.select(
        "certificate_number", *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in text_cols]
    )
    return filled
