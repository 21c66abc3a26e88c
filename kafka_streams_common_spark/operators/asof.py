"""As-of (point-in-time) join — Spark lacks a native one (SURVEY.md §2.7
range/as-of row).

The scalable construction is the union+window technique: tag both inputs,
union them, sort within each key partition by (time, tag) so right-side rows
precede left-side rows at equal timestamps, and carry the right side forward
with ``last_value(..., ignoreNulls)``. One shuffle + one partition-local
sort — O(n log n) per key group, no range cross-product, no per-group pandas.

Right-side timestamps must be unique per key for determinism; callers get a
``dedup_right`` knob that keeps the highest-tiebreak row per (key, time) —
matching engines whose ASOF picks an arbitrary row would otherwise be
nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    dedup_right: bool = True,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the matching right row within the same
    ``on`` key: ``direction='backward'`` (default) picks the greatest
    ``right_time`` ≤ ``left_time``; ``'forward'`` picks the smallest
    ``right_time`` ≥ ``left_time`` (both inclusive — the pandas
    ``merge_asof`` convention). Unmatched left rows keep null right
    columns.

    ``tolerance`` (a Column interval or numeric literal) bounds the
    directed gap: a backward match must satisfy ``left_time - right_time
    <= tolerance``, a forward match ``right_time - left_time <=
    tolerance``; beyond it the right columns null out — the
    "attribute only within N days" product convention. The construction
    is unchanged: one union, one keyed sort, one carry window — the
    tolerance is a post-carry column predicate, never a range join.

    ``on``: equality key column name present in both inputs.
    ``right_cols``: right columns to carry (default: all but key/time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]

    if dedup_right:
        w_dd = Window.partitionBy(on, right_time).orderBy(
            *[F.desc(c) for c in right_cols]
        )
        right = (
            right.withColumn("__dd", F.row_number().over(w_dd))
            .filter(F.col("__dd") == 1)
            .drop("__dd")
        )

    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal time → inclusive semantics;
    # forward direction is the same carry over time sorted DESCENDING
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the ENTIRE right row as one struct so the matched time and
    # every carried value come from the SAME right row — per-column
    # last(ignorenulls) would skip back to an OLDER right row for any
    # column that is genuinely NULL in the matched row, misattributing
    # values (and mis-gating them under tolerance, which tests __rt).
    r_row = F.last(
        F.when(
            F.col("__tag") == 0,
            F.struct(
                F.col("__t").alias("__asof_rt"),
                *[F.col(f"__r_{c}").alias(c) for c in right_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried = unioned.select(
        "__tag",
        F.col("__t").alias("__lt"),
        r_row.alias("__r"),
        *left_cols,
    )
    out = carried.filter(F.col("__tag") == 1)
    rt = F.col("__r").getField("__asof_rt")
    keep = F.col("__r").isNotNull()
    if tolerance is not None:
        tol = tolerance if hasattr(tolerance, "_jc") else F.lit(tolerance)
        gap_ok = (
            (F.col("__lt") - rt) <= tol
            if direction == "backward"
            else (rt - F.col("__lt")) <= tol
        )
        keep = keep & gap_ok
    return out.select(
        *left_cols,
        *[F.when(keep, F.col("__r").getField(c)).alias(c) for c in right_cols],
    )
