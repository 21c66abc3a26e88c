"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions.

The decode step is STUBBED with a deterministic fake (this container has no
image/audio libraries): ``_decode_payload`` derives pseudo pixel dimensions
and a byte-histogram feature vector purely from the payload bytes. The
Spark-side contract — binary column + metadata struct schema, ``mapInPandas``
over Arrow batches, per-partition batching, output schema — is the real,
tested production shape; swapping the fake for PIL/ffmpeg decode changes only
the body of ``_decode_payload``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_common_spark.functions.hashing import md5_int64

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

N_HIST_BINS = 16


def attach_fake_image_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Give each document an opaque binary payload + typed metadata struct —
    the canonical multimodal row shape ``(id, payload binary, meta struct)``.

    The payload is the utf-8 text bytes standing in for encoded image data;
    width/height are md5-derived so metadata is deterministic and
    oracle-reproducible.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.pmod(md5_int64(F.col(text_col)), F.lit(512)) + 1).cast("int").alias("width"),
            (F.pmod(md5_int64(F.reverse(F.col(text_col))), F.lit(512)) + 1)
            .cast("int")
            .alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes) -> list[float]:
    """STUB decode: deterministic byte-histogram features.

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(payload))``
    → resize → pixel stats; unavailable in this container, so features are a
    normalized 16-bin histogram of payload byte values — deterministic,
    cheap, and shape-compatible with a real feature extractor.

    Vectorized (``np.frombuffer`` + ``bincount``) — even a stub must model
    the pattern a real decoder body should follow inside the Arrow batch:
    numpy over the buffer, never a per-byte Python loop. Bit-identical to
    the scalar spelling ``bins[byte * N // 256] += 1; b / total``: the bin
    index is exact integer arithmetic and the normalization is the same
    IEEE-double division.
    """
    import numpy as np

    if not payload:
        return [0.0] * N_HIST_BINS
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    bins = np.bincount(b * N_HIST_BINS // 256, minlength=N_HIST_BINS)
    return (bins / len(payload)).tolist()


def sample_frames(
    multimodal: DataFrame,
    frame_size: int = 64,
    every_k: int = 4,
) -> DataFrame:
    """Frame sampling over the binary payload — the video-pipeline shape:
    split the payload into fixed-size frames, keep every k-th.

    Pure built-in expressions (substring over binary via sequence/transform)
    — the sampling plan is JVM-side; a real video decoder would replace the
    byte-windowing with keyframe extraction inside a ``mapInPandas`` stage
    but keep this exact output schema ``(doc_id, frame_idx, frame binary)``.
    """
    n_frames = F.ceil(F.octet_length("payload") / F.lit(frame_size)).cast("int")
    idxs = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_k == 0,
    )
    return multimodal.select(
        "doc_id",
        F.explode(idxs).alias("frame_idx"),
        F.expr(f"substring(payload, frame_idx * {frame_size} + 1, {frame_size})").alias(
            "frame"
        ),
    )


def extract_byte_histogram_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams per-partition Arrow batches through Python —
    the production pattern for decode/feature-extract stages: no driver
    collect, linear scaling with partition count, vectorizable batch bodies.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "features": pdf["payload"].map(lambda p: _decode_payload(bytes(p))),
                }
            )

    return multimodal.mapInPandas(decode_batches, out_schema)
