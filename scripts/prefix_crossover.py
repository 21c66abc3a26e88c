"""Prefix-swap crossover probe — distributed `global_prefix` vs the
single-partition `Window.orderBy` plan it replaced, at growing scale.

The 8× probes in SCALE.md show the distributed form amortizing (its
fixed costs — boundary aggregate, offset fold — dominate at sf0.1 size)
but never BEATING the single-partition window. This probe extends the
scale axis (1×/8×/32×/64× id-offset copies of the sf0.1 lineitem rank
shape: 600 k → 38.4 M rows) until the crossover is measured: the point
where one task sorting the entire input loses to 32 tasks each sorting
1/n_buckets of it. Both plans end in the identical bounded aggregate
(sum of ranks + count), so timings compare the rank machinery, not
result materialization.

Run on an IDLE machine. Usage: python scripts/prefix_crossover.py [scales…]
Output: one JSON line per scale with medians of 3 runs each.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_common_spark.operators.prefix import global_prefix  # noqa: E402
from kafka_streams_common_spark.queries.registry import table  # noqa: E402
from kafka_streams_common_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 64]
    spark = get_spark("prefix-crossover")

    # 2-column rank shape: unique bigint id + double order key (ties
    # across copies are real ties — the adversarial case for bucketing)
    base = table(spark, SF_DIR, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )

    def build(k: int):
        out = base
        for i in range(1, k):
            out = out.unionAll(
                base.withColumn("id", F.col("id") + F.lit(i * 100_000_000))
            )
        return out.localCheckpoint(eager=True)

    def distributed(df):
        r = global_prefix(df, ["x", "id"], rank_col="rnk")
        return r.groupBy().agg(F.sum("rnk").alias("s"), F.count(F.lit(1)).alias("n"))

    def single_partition(df):
        r = df.select(
            "id", F.row_number().over(Window.orderBy("x", "id")).alias("rnk")
        )
        return r.groupBy().agg(F.sum("rnk").alias("s"), F.count(F.lit(1)).alias("n"))

    def median_time(fn, df) -> tuple[float, int]:
        fn(df).collect()  # warm-up
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn(df).collect()
            times.append(time.perf_counter() - t0)
        return round(statistics.median(times), 2), int(rows[0]["n"])

    for k in scales:
        df = build(k)
        t_dist, n = median_time(distributed, df)
        t_single, n2 = median_time(single_partition, df)
        assert n == n2
        print(
            json.dumps(
                {
                    "scale": k,
                    "rows": n,
                    "distributed_sec": t_dist,
                    "single_partition_sec": t_single,
                    "speedup": round(t_single / t_dist, 2) if t_dist else None,
                }
            ),
            flush=True,
        )
        df.unpersist()


if __name__ == "__main__":
    main()
