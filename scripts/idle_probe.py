"""Isolated idle re-probe of named queries — the watch-item adjudication
protocol documented in BASELINE.md (r8 j5 / r9 triangle closures): fresh
session, bench protocol (session warm-up, noop sink, cache +
persistent-RDD clear per timed run), N back-to-back timed runs per query
at sf0.1, median + spread printed per query as one JSON line.

Run on an IDLE machine only — the whole point is removing ambient load
from the reading.

Usage: python scripts/idle_probe.py query_a,query_b [n_runs] [sf_dir]

``sf_dir`` (r17) makes the same protocol reusable for SF-RATIO probes
(VERDICT r16 #8 — core-ratio scaling at sf0.1 measures fixed cost, so
scale evidence comes from input-size ratios instead): run the same
query list at two SFs and compare medians.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from kafka_streams_common_spark.queries import QUERIES  # noqa: E402
from kafka_streams_common_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    global SF_DIR
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    if len(sys.argv) > 3:
        SF_DIR = sys.argv[3]
    spark = get_spark("idle-probe")

    def run(name: str) -> None:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def clear_state() -> None:
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(False)

    # session warm-up (JVM/JIT/file listing), same as bench.py
    QUERIES["tpch_q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        run(name)  # per-query warm-up
        times = []
        for _ in range(n_runs):
            clear_state()
            t0 = time.perf_counter()
            run(name)
            times.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "median_sec": round(statistics.median(times), 3),
                    "runs": times,
                    "sf_dir": SF_DIR,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
