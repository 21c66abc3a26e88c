"""Z-order (Morton-curve) layout clustering — the data-skipping
primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

A 100 TB table filtered on two dimensions (say ``customer`` AND a price
band) prunes poorly when files are sorted on either single column: the
other column's min/max spans every file. Interleaving the bits of both
columns' rank-space images produces a 1-D key whose contiguous ranges
are 2-D locality blocks — sorting/range-partitioning the table by that
key gives every file a TIGHT min/max envelope on BOTH columns at once,
so scan-level zone maps (parquet row-group stats, file stats) prune on
either predicate. The reference has no layout management at all (its
state lives in Kafka changelog topics); this is the Spark-native
warehouse counterpart.

Everything is whole-stage-codegen expression arithmetic — min/max scalar
aggregation (broadcast back), linear quantization to ``bits``-bit grid
cells, and a fold-based bit interleave. No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    ``i * n_cols + j``. A fold over the bit sequence keeps the whole
    thing one codegen expression."""
    n = len(cols)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + sum(
            (
                F.call_function(
                    "shiftleft",
                    F.call_function("shiftright", c, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
                for j, c in enumerate(cols)
            ),
            start=F.lit(0).cast("long"),
        ),
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> DataFrame:
    """Append a ``zkey`` column: the Morton interleave of each column's
    ``bits``-bit grid cell. Numeric columns are min/max-scaled to the
    grid in one scalar aggregation (broadcast back onto the scan — the
    facts never shuffle); constant columns collapse to cell 0.

    ``bits × len(cols)`` must fit in 63 bits. Downstream, sort or
    ``repartitionByRange`` on ``zkey`` before writing — every output
    file then holds a contiguous Z-curve range, i.e. a tight
    multi-dimensional min/max box for zone-map pruning.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds 63 bits")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    top = (1 << bits) - 1
    cells = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        scaled = F.when(mx > mn,
            F.floor(
                (F.col(c).cast("double") - mn) / (mx - mn) * top
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        cells.append(F.least(scaled, F.lit(top).cast("long")))
    return df.crossJoin(F.broadcast(stats)).select(
        *[F.col(c) for c in df.columns],
        _interleave(cells, bits).alias("zkey"),
    )
