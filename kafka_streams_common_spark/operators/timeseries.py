"""Time-series operators that need per-key sequential recurrences.

Window functions cover anything expressible as a frame aggregate (moving
averages, cumulative sums, lag/lead deltas — see queries/standard.py), but a
*recurrence* like EWMA (``y_i = a·x_i + (1-a)·y_{i-1}``) is inherently
sequential in i. The scalable Spark shape is a grouped Arrow kernel: the
series is keyed (one key = one independent series), each key's rows land in
one ``applyInPandas`` group, and the kernel runs the O(n) scan in C-speed
NumPy. Parallelism comes from the number of series, state is one scalar per
key, and no executor ever holds more than one key's series — the same
contract Structured Streaming's stateful operators make.

Determinism contract: the fold computes ``a*x + (1-a)*prev`` with IEEE
float64 in exactly that expression shape, which is the same one the DuckDB
recursive-CTE oracle evaluates — multiply, multiply, add, each correctly
rounded — so results are bit-identical across engines on any partitioning
(the per-key scan order is total, fixed by ``order_col``).

Reference scope note: the reference library (kafka-streams-common) has no
time-series surface at all; this extends the engine the way its KTable
aggregations would be extended with a custom ``Aggregator``
(DynamicTopologyBuilder.java:205-219 sketches only count).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructType


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key series.

    ``y_1 = x_1`` (first observation seeds the state), then
    ``y_i = alpha·x_i + (1-alpha)·y_{i-1}`` in ``order_col`` order within
    each key group. Prefer an exactly-representable ``alpha`` (0.25, 0.5,
    0.125…) so the recurrence is bit-reproducible on any engine.

    DETERMINISM: ``(key_cols, order_col)`` must be unique per row — a
    recurrence has no well-defined result under order ties (the stable
    sort would preserve whatever row order the shuffle delivered). If
    the series can carry duplicate timestamps, pass ``tiebreak_cols``
    to extend the sort into a total order; every in-repo caller feeds a
    pre-aggregated census (one row per key × period) so the default
    stays bare.

    Scale shape: one shuffle on ``key_cols`` (the applyInPandas grouping),
    then a map-side NumPy scan per series. Memory per task = one series —
    appropriate when series are bounded (per-entity daily rollups), which
    is the case for every pre-aggregated census this engine feeds it.
    """
    a = float(alpha)
    out_schema = StructType(list(df.schema.fields)).add(out_col, DoubleType())
    cols = list(df.columns) + [out_col]
    sort_cols = [order_col] + list(tiebreak_cols or [])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        vals = pdf[value_col].astype("float64").to_list()
        out = []
        prev = 0.0
        for i, x in enumerate(vals):
            # same expression shape as the oracle: a*x + (1-a)*prev,
            # two correctly-rounded multiplies and one add per step
            prev = x if i == 0 else a * x + (1.0 - a) * prev
            out.append(prev)
        pdf = pdf.assign(**{out_col: out})
        return pdf[cols]

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(
        kernel, out_schema
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key series
    — the level+trend recurrence behind short-horizon forecasting that
    EWMA (level only) cannot express:

    ``l_1 = x_1``, ``b_1 = 0``, then
    ``l_i = alpha·x_i + (1−alpha)·(l_{i−1} + b_{i−1})``,
    ``b_i = beta·(l_i − l_{i−1}) + (1−beta)·b_{i−1}``.

    Adds ``level``, ``trend``, and ``forecast`` (= level + trend, the
    one-step-ahead prediction). Same execution and determinism contract
    as ``ewma`` above: grouped Arrow kernel, one shuffle on
    ``key_cols``, float64 in exactly the expression shapes a recursive
    CTE replays (prefer exactly-representable alpha/beta);
    ``(key_cols, order_col)`` must be unique unless ``tiebreak_cols``
    extends the sort to a total order.
    """
    a = float(alpha)
    g = float(beta)
    out_schema = (
        StructType(list(df.schema.fields))
        .add("level", DoubleType())
        .add("trend", DoubleType())
        .add("forecast", DoubleType())
    )
    cols = list(df.columns) + ["level", "trend", "forecast"]
    sort_cols = [order_col] + list(tiebreak_cols or [])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        vals = pdf[value_col].astype("float64").to_list()
        levels, trends = [], []
        lv = bv = 0.0
        for i, x in enumerate(vals):
            if i == 0:
                lv, bv = x, 0.0
            else:
                prev = lv
                # same expression shapes as the recursive-CTE oracle
                lv = a * x + (1.0 - a) * (prev + bv)
                bv = g * (lv - prev) + (1.0 - g) * bv
            levels.append(lv)
            trends.append(bv)
        pdf = pdf.assign(
            level=levels,
            trend=trends,
            forecast=[lv + bv for lv, bv in zip(levels, trends)],
        )
        return pdf[cols]

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(
        kernel, out_schema
    )
