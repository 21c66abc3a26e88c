"""Time-interval (range) join — bucketed equi-join construction.

A naive range join is a per-key cross product filtered by the time
predicate; at scale the cross product dominates. The standard fix: bucket
time into ``max_gap``-wide cells, explode one side into its cell and the two
adjacent cells, equi-join on (key, cell) — every qualifying pair shares an
exploded cell by construction — then apply the exact predicate. Shuffle is
O(3n) rows and Catalyst executes a plain hash join; no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_pairs(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs of rows with the same ``key`` whose times lie within
    ``max_gap_seconds`` of each other: ``(id_a, id_b, key, gap_ms)`` with
    ``id_a < id_b``.
    """
    gap_ms = max_gap_seconds * 1000
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_millis(F.col(time_col)).alias("__ms"),
    ).withColumn("__cell", F.expr(f"__ms div {gap_ms}"))

    # left keeps its own cell; right appears in cell-1, cell, cell+1
    right = base.select(
        "__k",
        F.col("__id").alias("__id_r"),
        F.col("__ms").alias("__ms_r"),
        F.explode(
            F.array(F.col("__cell") - 1, F.col("__cell"), F.col("__cell") + 1)
        ).alias("__cell"),
    )
    joined = base.join(right, ["__k", "__cell"]).filter(
        (F.col("__id") < F.col("__id_r"))
        & (F.abs(F.col("__ms") - F.col("__ms_r")) <= gap_ms)
    )
    return joined.select(
        F.col("__id").alias("id_a"),
        F.col("__id_r").alias("id_b"),
        F.col("__k").alias(key),
        F.abs(F.col("__ms") - F.col("__ms_r")).alias("gap_ms"),
    ).distinct()
