"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship config-driven enrichment chain
(SURVEY.md §2.3 J5) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
named operator surface from ``kafka_streams_common_spark.queries`` — one
entry per implemented SURVEY.md §2 operator, with DuckDB oracles where the
semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler
from kafka_streams_common_spark.pipelines import ENRICHED_ORDERS
from kafka_streams_common_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    catalog = TableCatalog.for_directory("/root/testdata/sf0.001")
    return BatchCompiler(spark, catalog).compile(ENRICHED_ORDERS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names)."""
    return dict(ORACLES)
