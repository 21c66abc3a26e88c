"""Spark-vs-DuckDB parity over the whole named query surface — the local
twin of the driver's CORRECTNESS gate (row count + order-insensitive values).
"""

from __future__ import annotations

import pytest

from kafka_streams_common_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle_con):
    df = QUERIES[name](spark, SF_ORACLE)
    assert_matches_oracle(df, oracle_con, ORACLES[name])


def test_registered_count_matches_readme():
    """README.md's verification ledger states the registered-query
    count in prose; the ledger is the trust anchor, so the prose must
    track ``len(QUERIES)`` exactly (the r8 verdict caught a drift)."""
    import pathlib
    import re

    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    m = re.search(r"this repo\nregisters (\d+) — all (\d+) oracle-gated",
                  readme.read_text())
    assert m, "README ledger count sentence not found"
    assert int(m.group(1)) == len(QUERIES), (m.group(1), len(QUERIES))
    assert int(m.group(2)) == len(ORACLES), (m.group(2), len(ORACLES))


def test_every_query_runs_and_named(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        # schema is stable/derivable without an action
        _ = df.schema
