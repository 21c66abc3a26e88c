"""Incremental aggregate maintenance — mergeable partial states.

The materialized-view pattern behind every warehouse rollup at 100 TB:
never re-aggregate history. Each ingest batch (a day, an hour, a
microbatch) reduces to a PARTIAL-STATE table — per group key, the
algebraic state of every measure (count, exact sum, min, max) — and the
published view is a MERGE of partial states, which is itself the same
aggregation over |groups|-sized inputs. Re-stating a late-arriving day
means rebuilding ONE day's partials, not rescanning the table; coarser
rollups (day → month → total) merge the same states without touching
facts. The sketch twin of this pattern (HLL distinct counts) is
``agg_hll_mergeable_rollup``; this module is the exact-measure form.

Sums use the repo's DECIMAL convention (round 6 dp → DECIMAL(28,12))
so a merge of partials is bit-equal to the direct aggregate on any
partitioning, batch split, or engine — that equality IS the oracle of
``incremental_agg_orders_by_status``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg_state(
    batch: DataFrame,
    keys: list[str],
    measure: str,
) -> DataFrame:
    """Reduce one ingest batch to per-group algebraic state:
    ``(*keys, n_rows, sum_m, min_m, max_m)``."""
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col(measure), 6).cast("decimal(28,12)")).alias("sum_m"),
        F.min(measure).alias("min_m"),
        F.max(measure).alias("max_m"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial-state tables into one state of the union of their
    inputs — count/sum add, min/max fold; associative and commutative,
    so any merge tree (day → month → total) yields the identical state."""
    if not states:
        raise ValueError("no states to merge")
    merged = states[0]
    for st in states[1:]:
        merged = merged.unionByName(st)
    return merged.groupBy(*keys).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("sum_m").alias("sum_m"),
        F.min("min_m").alias("min_m"),
        F.max("max_m").alias("max_m"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-feed between two table snapshots: one row per changed
    key with ``change_type`` ∈ {insert, update, delete} — the diff a
    warehouse publishes when a source can't emit a changelog (the
    reverse direction of the CDC-apply operators: they fold changes into
    state, this recovers changes from states).

    Keys present only in ``new`` → insert; only in ``old`` → delete;
    present in both with ANY non-key column differing → update
    (NULL-safe comparison via a canonical row digest, so NULL→value and
    value→NULL transitions register). Unchanged keys are dropped — the
    output is change-volume-sized, not table-sized.

    Scale shape: one full outer join co-partitioned on the key plus a
    map-side md5 of the non-key columns on each side; at 100 TB both
    snapshots hash-shuffle once on the key (or not at all if bucketed
    on it), and nothing else moves. Schemas must match.
    """
    if old.columns != new.columns:
        raise ValueError(
            f"schema mismatch: {old.columns} vs {new.columns}"
        )
    val_cols = [c for c in old.columns if c not in key_cols]

    def digest(df: DataFrame, tag: str) -> DataFrame:
        # canonical NULL-safe row digest over non-key columns
        return df.select(
            *key_cols,
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in val_cols
                    ],
                )
            ).alias(f"__h_{tag}"),
        )

    o = digest(old, "o")
    n = digest(new, "n")
    joined = o.join(n, key_cols, "full_outer").filter(
        F.col("__h_o").isNull()
        | F.col("__h_n").isNull()
        | (F.col("__h_o") != F.col("__h_n"))
    )
    return joined.select(
        *key_cols,
        F.when(F.col("__h_o").isNull(), F.lit("insert"))
        .when(F.col("__h_n").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    )


def peak_concurrency_by_day(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Peak number of simultaneously-open intervals per day, sweep-line
    form: each row opens an end-exclusive interval ``[ts, ts+duration)``;
    intervals are CLIPPED at midnight so every ±1 edge lives in exactly
    one day and the running-sum window is day-partitioned — parallel
    across days, never the global single-partition sort a textbook sweep
    line implies. At equal timestamps ends (-1) sort before starts (+1),
    and the max prefix sum is invariant to permutations of identical
    edges, so the result is deterministic under any partitioning.

    Returns ``(day DATE, max_concurrent BIGINT)``.
    """
    from pyspark.sql import Window

    iv = df.select(
        F.col(ts_col).alias("s"),
        (F.col(ts_col) + F.expr(duration)).alias("e"),
    )
    # last covered day of the END-EXCLUSIVE interval: day(e) unless e
    # falls exactly on its midnight, then the previous day — so a
    # multi-day interval contributes a segment to EVERY day it covers
    # (a start-day + end-day pair alone silently skips interior days)
    last_day = F.when(
        F.col("e") > F.to_date("e").cast("timestamp"), F.to_date("e")
    ).otherwise(F.date_sub(F.to_date("e"), 1))
    seg = iv.select(
        "s",
        "e",
        F.explode(
            F.sequence(F.to_date("s"), last_day, F.expr("interval 1 day"))
        ).alias("day"),
    ).select(
        "day",
        F.greatest("s", F.col("day").cast("timestamp")).alias("seg_s"),
        F.least(
            "e", F.date_add("day", 1).cast("timestamp")
        ).alias("seg_e"),
    )
    edges = seg.select(
        "day", F.col("seg_s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        seg.select("day", F.col("seg_e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = edges.select("day", F.sum("delta").over(w).alias("open_now"))
    return run.groupBy("day").agg(
        F.max("open_now").cast("bigint").alias("max_concurrent")
    )
