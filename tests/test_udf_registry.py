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


def test_registered_grouped_agg_pandas_udaf_in_aggregation_spec(spark):
    """UDAF leg: a GROUPED_AGG pandas UDF registered by name is usable as
    an aggregation fn in config (the reference's bring-your-own-class
    aggregator hook, Spark-idiomatic)."""
    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def price_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    comp = BatchCompiler(
        spark,
        TableCatalog.for_directory(SF_SMOKE),
        udfs={"price_range": price_range},
    )
    p = PipelineDef(
        id="udaf-demo",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="orders"),
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_orderstatus"),
        aggregations=(
            AggregationSpec(
                fn="price_range",
                source_field="o_totalprice",
                alias="range",
                custom=True,
            ),
        ),
    )
    got = {r["key"]: r["range"] for r in comp.compile(p).collect()}
    want = {
        r["o_orderstatus"]: r["rng"]
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg((F.max("o_totalprice") - F.min("o_totalprice")).alias("rng"))
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_registered_udtf_in_lateral_position(spark):
    """UDTF leg: a registered table function explodes each props string
    into (key, value) rows in LATERAL position."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="k string, v string")
    class ParseKV:
        def eval(self, s: str):
            if not s:
                return
            body = s.strip().strip("{}")
            for part in body.split(","):
                if ":" in part:
                    k, v = part.split(":", 1)
                    yield k.strip().strip('"'), v.strip()

    BatchCompiler(
        spark,
        TableCatalog.for_directory(SF_SMOKE),
        udtfs={"parse_kv": ParseKV},
    )
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(5).createOrReplaceTempView(
        "udtf_events"
    )
    rows = spark.sql(
        "SELECT e.event_id, p.k, p.v FROM udtf_events e, LATERAL parse_kv(e.props) p"
    ).collect()
    assert len(rows) == 5
    assert all(r["k"] == "k" and r["v"].isdigit() for r in rows)


def test_custom_aggregation_validation_errors():
    from kafka_streams_common_spark.config import (
        PipelineValidationError,
        validate_pipeline,
    )

    def pipe(**agg_kwargs):
        return PipelineDef(
            id="bad",
            mode=ProcessingMode.AGGREGATION,
            source=SourceDef(name="orders"),
            group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_orderstatus"),
            aggregations=(AggregationSpec(**agg_kwargs),),
        )

    import pytest

    with pytest.raises(PipelineValidationError, match="identifier"):
        validate_pipeline(pipe(fn="drop table; --", custom=True, source_field="x"))
    with pytest.raises(PipelineValidationError, match="source_field"):
        validate_pipeline(pipe(fn="my_udaf", custom=True))
    with pytest.raises(PipelineValidationError, match="unsupported"):
        validate_pipeline(pipe(fn="my_udaf", source_field="x"))  # custom not set
