"""Cross-engine deterministic hashing.

All fuzzy-dedup operators (minhash, simhash, shingle hashing) need a hash
function that produces IDENTICAL values in Spark and in the DuckDB oracle.
Engine-native hashes differ (Spark xxhash64 vs DuckDB hash), so we derive a
60-bit integer from the first 15 hex chars of md5 — md5 is bytewise identical
everywhere. 15 hex chars < 2^60 always fits in a signed 64-bit int.

Spark side stays fully JVM/codegen (md5 + conv + cast — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int64(col: Column | str) -> Column:
    """Spark: first 60 bits of md5(col) as a non-negative bigint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5_int64_sql(expr: str) -> str:
    """The DuckDB twin of :func:`md5_int64` for oracle SQL strings."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"
