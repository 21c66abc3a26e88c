"""Skew mitigation: salted two-stage aggregation.

A hot grouping key turns one reducer into the job's critical path. Salting
splits each key into ``n_salt`` sub-keys for a partial aggregate (spreading
the hot key across reducers), then re-aggregates partials by the true key —
the second stage sees at most ``n_salt`` rows per key regardless of skew.

Only algebraic aggregates decompose this way (count→sum of counts,
sum→sum, min→min, max→max); holistic ones (exact median) do not.
The salt is a deterministic hash of the row's other columns, so results are
reproducible (no ``rand()``), and AQE's skew handling composes on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "count": F.sum,  # counts re-combine by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str | Column]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: output column → (fn, input column/expr) with
    fn ∈ {count, sum, min, max}. For count the input is ignored.

    >>> salted_aggregate(orders, "o_orderstatus",
    ...     {"n": ("count", "*"), "total": ("sum", "o_totalprice")})
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: {fn!r} is not algebraic-decomposable")

    non_key = [c for c in df.columns if c != key]
    salt = F.pmod(F.xxhash64(*non_key), F.lit(n_salt))

    partial_cols = [
        _PARTIAL[fn](F.expr(src) if isinstance(src, str) and src != "*" else F.lit(1)).alias(
            f"__p_{name}"
        )
        for name, (fn, src) in aggs.items()
    ]
    partial = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*partial_cols)

    final_cols = [
        _FINAL[fn](F.col(f"__p_{name}")).alias(name) for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(key).agg(*final_cols)
