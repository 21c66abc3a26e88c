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
