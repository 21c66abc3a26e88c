"""Reusable column-expression helpers (JVM-side, codegen-friendly)."""

from kafka_streams_common_spark.functions.hashing import md5_int64, md5_int64_sql
from kafka_streams_common_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "md5_int64",
    "md5_int64_sql",
    "to_double_array",
]
