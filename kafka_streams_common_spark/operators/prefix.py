"""Distributed global-order prefix aggregation (rank / running sums).

Spark's ``Window.orderBy(...)`` WITHOUT a ``partitionBy`` plans a
single-partition total sort — the classic scale killer behind global
``ntile``/``row_number``/running-sum readouts (WindowExec itself warns
about it). This module owns the standard two-phase fix so every query
that needs a GLOBAL ordered prefix can stay parallel:

1. **Bucket by value.** A constant-size set of approx-quantile
   boundaries over the first order column is collected to the driver
   (``n_buckets - 1`` doubles — the same bounded-collect discipline as
   the IVF centroid train) and turned into a literal comparison chain,
   so every row gets a deterministic bucket id with NO sampling-based
   repartition (``repartitionByRange`` re-samples per evaluation; a
   literal expression cannot diverge between the two plan branches
   below). Rows compare on the first order column only, so ties stay
   in one bucket and bucket order respects the full sort order.
2. **Per-bucket offsets.** One ``groupBy(bucket)`` computes each
   bucket's row count and column sums — ``n_buckets`` rows collected to
   the driver (bounded by construction, the same discipline as the IVF
   centroid train) and folded into cumulative offsets, re-emitted as a
   literal CASE chain so no window or join touches them at all.
3. **Within-bucket windows.** ``Window.partitionBy(bucket)`` runs the
   ordered prefix in parallel across buckets; adding the broadcast
   offset yields the EXACT global rank / running sum — bit-identical to
   the single-partition plan, at ``1/n_buckets`` the partition size.

Skew note: exact global order with heavy value ties cannot split a tie
run across buckets (correctness of rank tie-break needs them co-sorted);
a value held by a large fraction of all rows therefore lands in one
bucket. That is inherent to EXACT prefix semantics — for sketchy
readouts use approx-quantile binning instead (``profile.py``).

No reference counterpart (the reference has no ordered-analytics
surface at all); this is engine infrastructure for SURVEY §2.7 window
functions at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)


def _order_surrogate(df: DataFrame, col: str):
    """A DOUBLE expression monotone with ``col``'s NATIVE sort order,
    used ONLY for bucket-boundary derivation and bucket assignment.

    Restricting to types with a monotone double mapping is load-bearing:
    a numeric-parseable STRING column would bucket numerically but sort
    lexicographically within buckets, silently corrupting global ranks
    (keys '1'..'24' would give rank('2')=2 instead of 12). Strings and
    other types raise instead of mis-ranking.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    if isinstance(dt, BooleanType):
        return F.col(col).cast("int").cast("double")
    if isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
        # date → timestamp → epoch seconds: monotone (double precision can
        # collapse microsecond ties far from the epoch into one bucket —
        # harmless, the within-bucket sort uses the native column)
        return F.col(col).cast("timestamp").cast("double")
    raise TypeError(
        f"global_prefix order column {col!r} has type {dt.simpleString()}; "
        "only numeric/boolean/date/timestamp order keys have a bucket "
        "order consistent with their native sort order. Cast or re-key "
        "(e.g. a dense numeric id) before calling."
    )


# NULL first-order keys sort FIRST under Spark's default ASC NULLS FIRST
# — the dedicated bucket below every boundary-derived one keeps them
# exact instead of dropping them to a NULL bucket id (which would both
# null their rank and silently inflate later buckets' offsets).
_NULL_BUCKET = -1


def _bucket_expr(surrogate, bounds: list[float]):
    """Literal bucket id: number of boundaries strictly below the value;
    NULL keys get the dedicated first bucket."""
    b = F.lit(0)
    for cut in bounds:
        b = b + (surrogate > F.lit(float(cut))).cast("int")
    return F.when(surrogate.isNull(), F.lit(_NULL_BUCKET)).otherwise(b).cast("int")


def global_prefix(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str] | None = None,
    rank_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Add exact global running sums and/or a global 1-based rank.

    ``order_cols`` define the total order (first column drives the
    bucketing; the full list drives the within-bucket sort, so pass a
    tie-breaking suffix — e.g. ``["score", "doc_id"]`` — whenever the
    first column can tie and ``rank_col`` is requested). ``sum_cols``
    each gain a ``run_<name>`` running-sum column (sum over all rows at
    or before the current row in the global order); ``rank_col`` names
    an exact global ``row_number`` output column. Output keeps every
    input column.
    """
    if not sum_cols and rank_col is None:
        raise ValueError("nothing to compute: pass sum_cols or rank_col")
    sum_cols = list(sum_cols or [])
    spark = df.sparkSession
    n = n_buckets or spark.sparkContext.defaultParallelism
    key = order_cols[0]
    surrogate = _order_surrogate(df, key)

    bounds: list[float] = []
    if n > 1:
        qs = [i / n for i in range(1, n)]
        row = df.agg(
            F.percentile_approx(
                surrogate, F.array(*[F.lit(q) for q in qs]), F.lit(2000)
            ).alias("b")
        ).collect()[0]["b"]
        if row is not None:
            # dedup + sort: equal boundaries would create empty buckets
            # (harmless) but the literal chain is cheaper without them
            bounds = sorted(set(float(x) for x in row))

    part = df.withColumn("__bucket", _bucket_expr(surrogate, bounds))

    off_aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(c).alias(f"__bs_{c}") for c in sum_cols
    ]
    # ≤ n_buckets rows — bounded collect; folded to cumulative offsets
    # on the driver and re-emitted as literal CASE chains (no window, no
    # join — nothing data-sized ever single-partitions)
    per = part.groupBy("__bucket").agg(*off_aggs).orderBy("__bucket").collect()
    cum_cnt = 0
    cum_sum = {c: 0 for c in sum_cols}
    offsets: list[tuple[int, int, dict[str, object]]] = []
    for r in per:
        offsets.append((r["__bucket"], cum_cnt, dict(cum_sum)))
        cum_cnt += r["__cnt"]
        for c in sum_cols:
            s = r[f"__bs_{c}"]
            if s is not None:
                cum_sum[c] = cum_sum[c] + s

    def case_chain(pick):
        expr = None
        for bucket, off_cnt, off_sums in offsets:
            val = F.lit(pick(off_cnt, off_sums))
            cond = F.col("__bucket") == F.lit(bucket)
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        return F.lit(pick(0, {c: 0 for c in sum_cols})) if expr is None else expr

    w_in = Window.partitionBy("__bucket").orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    proj = [F.col(c) for c in df.columns]
    sum_types = {f.name: f.dataType for f in part.select(
        *[F.sum(c).alias(c) for c in sum_cols]
    ).schema.fields} if sum_cols else {}
    for c in sum_cols:
        off = case_chain(lambda _cnt, s, c=c: s[c]).cast(sum_types[c])
        proj.append((F.sum(c).over(w_in) + off).alias(f"run_{c}"))
    if rank_col is not None:
        off_cnt = case_chain(lambda cnt, _s: cnt).cast("bigint")
        proj.append(
            (F.row_number().over(w_in) + off_cnt)
            .cast("bigint")
            .alias(rank_col)
        )
    return part.select(*proj)


def ntile_from_rank(rank, total, n_tiles: int):
    """SQL ``ntile(n)`` bucket from an exact global rank — the
    rank-algebra twin of ``ntile(n) OVER (ORDER BY ...)``: with
    ``total`` rows, the first ``total % n`` tiles get
    ``total div n + 1`` rows, the rest ``total div n`` (the standard
    definition DuckDB and Spark share). Columns in, Column out; both
    inputs must be integral Columns."""
    base = (total / F.lit(n_tiles)).cast("bigint")  # floor div
    rem = (total % F.lit(n_tiles)).cast("bigint")
    big = base + F.lit(1)
    threshold = rem * big
    return (
        F.when(rank <= threshold, ((rank - 1) / big).cast("bigint") + 1)
        .otherwise(
            rem
            + ((rank - threshold - 1) / F.greatest(base, F.lit(1))).cast(
                "bigint"
            )
            + 1
        )
        .cast("bigint")
    )
