"""Query registry primitives shared by all query modules.

Every implemented operator registers a callable ``(spark, sf_dir) ->
DataFrame`` and (when ANSI-SQL-expressible) a DuckDB oracle SQL string with
identical output column names — the driver's correctness contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def compiler_for(spark: SparkSession, sf_dir: str) -> BatchCompiler:
    return BatchCompiler(spark, TableCatalog.for_directory(sf_dir))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table through the catalog (ts normalization applied)."""
    return TableCatalog.for_directory(sf_dir).resolve(name).read(spark)
