"""Capture .explain('formatted') output for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> query_a,query_b [sf_dir]

Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix = before|after).
Query construction may run driver-side jobs (centroid training, CC rounds);
the captured plan is the FINAL returned DataFrame's physical plan, which is
what the bench's noop write executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from kafka_streams_common_spark.queries import QUERIES  # noqa: E402
from kafka_streams_common_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
