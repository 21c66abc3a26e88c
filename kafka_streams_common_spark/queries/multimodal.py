"""Multimodal-column queries: binary payload plumbing with typed metadata.

The metadata path is fully oracle-checkable (md5-derived fake dimensions);
the feature-extraction path exercises the real ``mapInPandas`` Arrow
pipeline and gets the driver's rows-only check (its fake decode is the
explicitly-stubbed stage — see operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.multimodal import (
    attach_fake_image_payload,
    extract_byte_histogram_features,
)
from kafka_streams_common_spark.queries.registry import query, table


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'fake' AS format,
           ('0x' || substr(md5(text), 1, 15))::BIGINT % 512 + 1 AS width,
           ('0x' || substr(md5(reverse(text)), 1, 15))::BIGINT % 512 + 1 AS height,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_fake_image_payload(table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").cast("bigint").alias("width"),
        F.col("meta.height").cast("bigint").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query("multimodal_feature_extract")  # stubbed decode → rows-only driver check
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = attach_fake_image_payload(table(spark, sf_dir, "documents"))
    feats = extract_byte_histogram_features(mm)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_mass"
        ),
        F.size("features").alias("n_features"),
    )
