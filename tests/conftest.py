from __future__ import annotations

import math
import os

import duckdb
import pytest

from kafka_streams_common_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(x) -> str:
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NULL"
        return format(x, ".10g")
    if hasattr(x, "tolist"):  # numpy arrays (array columns) → plain lists
        x = x.tolist()
    return str(x)


def canonical_rows(pdf) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, every cell
    stringified, rows sorted — the same shape the driver hashes."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(c) for c in row))
    out.sort()
    return out


def assert_matches_oracle(spark_df, oracle_con, sql: str):
    got = canonical_rows(spark_df.toPandas())
    want = canonical_rows(oracle_con.execute(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert got == want
