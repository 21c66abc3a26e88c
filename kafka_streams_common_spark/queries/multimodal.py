"""Multimodal-column queries: binary payload plumbing with typed metadata.

The metadata path is fully oracle-checkable (md5-derived fake dimensions);
the feature-extraction path exercises the real ``mapInPandas`` Arrow
pipeline and is hash-gated on its plumbing invariants (dims, histogram
normalization, bin count, row conservation) — only the decoded CONTENT
is un-oracled, because the fake decode is the explicitly-stubbed stage
(see operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.multimodal import (
    attach_fake_image_payload,
    extract_byte_histogram_features,
    sample_frames,
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


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(list_filter(generate_series(0, CAST(ceil(length(text) / 64.0) AS INT) - 1),
                              i -> i % 4 = 0)) AS frame_idx,
           CAST(length(substr(text, 1, 64)) > 0 AS BIGINT) AS has_bytes
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: every 4th 64-byte frame per payload. The
    oracle checks the sampling geometry (doc, frame index, non-emptiness) —
    frame bytes themselves are binary and checked in pytest."""
    mm = attach_fake_image_payload(table(spark, sf_dir, "documents"))
    frames = sample_frames(mm, frame_size=64, every_k=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        (F.octet_length("frame") > 0).cast("bigint").alias("has_bytes"),
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 512 + 1 AS INT)
             AS width,
           CAST(('0x' || substr(md5(reverse(text)), 1, 15))::BIGINT % 512 + 1
                AS INT) AS height,
           1.0 AS feature_mass,
           CAST(16 AS INT) AS n_features
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode/feature pipeline, hash-gated on its PLUMBING
    invariants: metadata dimensions must survive the Arrow round-trip
    unchanged (md5-derived, replayed by the oracle), the stub histogram
    must be a normalized distribution (mass 1.0 at 6 dp) with exactly 16
    bins, and every document must come back. The decoded CONTENT stays
    un-oracled — the decode body is the honestly-stubbed seam
    (operators.multimodal) a real image library drops into."""
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
