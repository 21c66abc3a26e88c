"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (JVM-side, no Python UDF in the hot path).

Accumulation is a sequential left fold in doubles (``F.aggregate``), which is
deterministic and exactly reproducible in the DuckDB oracle via
``list_sum(list_transform(...))`` — necessary for order-insensitive value
hashing of similarity scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
