"""Single-pass data-quality profiling and constraint verification.

The data-observability tier (Deequ/Great-Expectations-style) a
production analytics engine runs in front of every pipeline — absent
from the reference entirely (its only validation is schema lookup,
``SchemaService.java:47-55``); this module generalizes that seam into
metric profiling and declarative constraint checks.

Scale shape: every metric for every profiled column is computed in ONE
aggregation over the table — a map-side partial per column metric, one
exchange of constant-size partials, no per-column rescan (the naive
loop-of-queries profiler reads a 100 TB table once per column; this
reads it once, period). Exact distinct counts are the only metric that
is not a constant-size partial — Spark plans multiple COUNT(DISTINCT)
via an Expand (one pass, rows × |columns|); pass ``approx=True`` to
swap them for HyperLogLog sketches (constant-size, mergeable — the
100 TB default; exact mode exists so the DuckDB oracle can replay the
numbers bit-for-bit at test scale). The long-form reshape afterwards
touches ONE row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per profiled column:
    ``(column, n_rows, n_nulls, completeness, n_distinct, min_value,
    max_value, mean_value)`` — min/max cast to string so the schema is
    uniform across types; ``mean_value`` is null for non-numeric
    columns and DECIMAL-exact (order-free sum, cast to double at the
    end) for numeric ones, so the number is identical on any engine and
    any partitioning. ``rsd`` tunes the HLL relative standard deviation
    in ``approx`` mode (default 0.05, the Spark default).
    """
    cols = columns if columns is not None else df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c, rsd) if approx else F.countDistinct(c)
        )
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(distinct.alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if isinstance(schema[c], _NUMERIC):
            # try_divide: an EMPTY input must profile to null mean, not
            # an ANSI divide-by-zero (identical to `/` whenever count>0)
            mean = F.try_divide(
                F.sum(
                    F.round(F.col(c).cast("double"), 6).cast("decimal(28,12)")
                ).cast("double"),
                F.count(c),
            )
        else:
            mean = F.lit(None).cast("double")
        aggs.append(mean.alias(f"__mean_{c}"))

    wide = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.try_divide(F.col(f"__nn_{c}"), F.col("__n_rows")).alias(
                "completeness"
            ),
            F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
            F.col(f"__mean_{c}").alias("mean_value"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("m")
    ).select("m.*")


def check_constraints(
    df: DataFrame,
    checks: list[tuple[str, Column, Column]],
) -> DataFrame:
    """Verify declarative constraints in one aggregation pass.

    ``checks`` is ``(name, observed_agg, passed_agg)`` — ``observed`` an
    aggregate expression producing the measured number (castable to
    double), ``passed`` an aggregate boolean. Returns one row per check:
    ``(constraint_name, observed, passed)``, in the declared order.

    All observed/passed expressions land in a single ``df.agg`` — the
    whole suite costs one table scan regardless of how many constraints
    it holds.
    """
    if not checks:
        raise ValueError("no constraints given")
    names = [n for n, _, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names: {names}")

    # Internal aliases are POSITIONAL (__obs_0, __ok_0, …), never the
    # user-supplied names: interpolating a name containing '.', '`' or
    # other identifier-special characters into an alias and resolving it
    # back via F.col() would break analysis (a dot parses as a
    # nested-field access). The display name only ever appears as a
    # string literal in the output column.
    aggs = []
    for i, (_, observed, passed) in enumerate(checks):
        aggs.append(observed.cast("double").alias(f"__obs_{i}"))
        aggs.append(passed.alias(f"__ok_{i}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("constraint_name"),
            F.col(f"__obs_{i}").alias("observed"),
            F.col(f"__ok_{i}").alias("passed"),
        )
        for i, name in enumerate(names)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


def profile_drift_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two batches of one numeric
    column — the drift monitor a governance tier runs between
    yesterday's and today's ingest (PSI < 0.1 stable, > 0.25 action):
    equi-width buckets over the COMBINED min/max, smoothed per-bucket
    frequencies, ``psi_term = (p_a − p_b)·ln(p_a/p_b)`` per bucket
    (their sum is the PSI).

    Returns one row per bucket:
    ``(bucket, n_a, n_b, p_a, p_b, psi_term)`` — the per-bucket
    decomposition, so a drift alert points at WHERE the distribution
    moved, not just that it did.

    Scale shape: one scalar min/max aggregation over the union
    (broadcast back), then one bucket-keyed hash aggregation per side —
    map-side combinable, |buckets|-sized outputs; the final arithmetic
    runs on 2·|buckets| rows. Add-one smoothing keeps empty buckets
    finite. Determinism: counts are integers, the ratio arithmetic is
    a fixed IEEE expression, and ``psi_term`` is rounded to 8 dp — the
    repo's cross-engine convention.
    """
    a = df_a.select(F.col(column).cast("double").alias("x"))
    b = df_b.select(F.col(column).cast("double").alias("x"))
    both = a.unionAll(b)
    stats = both.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        cell = F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    (F.col("x") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * n_buckets
                ).cast("long"),
                F.lit(n_buckets - 1).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long"))
        return (
            df.crossJoin(F.broadcast(stats))
            .groupBy(cell.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    buckets = df_a.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    counts = (
        buckets.join(bucketed(a, "n_a"), "bucket", "left")
        .join(bucketed(b, "n_b"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("ta") + n_buckets).cast(
        "double"
    )
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tb") + n_buckets).cast(
        "double"
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        pa.alias("p_a"),
        pb.alias("p_b"),
        F.round((pa - pb) * F.log(pa / pb), 8).alias("psi_term"),
    )
