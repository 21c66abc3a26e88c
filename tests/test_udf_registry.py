"""Config-addressable UDF extension point (the reference's commented
valueJoinerClass/groupByKeyExtractorClass hooks, done the Spark way)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler
from kafka_streams_common_spark.config import (
    AggregationSpec,
    KeyExtraction,
    KeySource,
    PipelineDef,
    ProcessingMode,
    SourceDef,
)
from tests.conftest import SF_SMOKE


def test_registered_pandas_udf_usable_in_config_expressions(spark):
    @F.pandas_udf(T.DoubleType())
    def price_bucket(s: pd.Series) -> pd.Series:
        return (s / 100000.0).round()

    comp = BatchCompiler(
        spark,
        TableCatalog.for_directory(SF_SMOKE),
        udfs={"price_bucket": price_bucket},
    )
    p = PipelineDef(
        id="udf-demo",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="orders"),
        filter="price_bucket(o_totalprice) >= 2.0",  # UDF by name in config
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_orderstatus"),
        aggregations=(AggregationSpec(fn="count", alias="n"),),
    )
    df = comp.compile(p)
    rows = {r["key"]: r["n"] for r in df.collect()}
    assert sum(rows.values()) > 0
    # cross-check against the same predicate expressed natively
    native = (
        TableCatalog.for_directory(SF_SMOKE)
        .resolve("orders")
        .read(spark)
        .filter(F.round(F.col("o_totalprice") / 100000.0) >= 2.0)
        .count()
    )
    assert sum(rows.values()) == native
