"""End-to-end: JSON config files (reference dialect) → compiled plans →
results, including sink write with compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler
from kafka_streams_common_spark.config import load_pipeline_json
from tests.conftest import SF_SMOKE


def test_enrichment_example_runs(spark):
    p = load_pipeline_json("examples/enrichment_pipeline.json")
    df = BatchCompiler(spark, TableCatalog.for_directory(SF_SMOKE)).compile(p)
    assert set(df.columns) == {"key", "order_id", "total_price", "customer_name", "segment"}
    assert df.count() == 1500


def test_aggregation_example_runs_and_writes_compacted(spark, tmp_path):
    p = load_pipeline_json("examples/aggregation_pipeline.json")
    comp = BatchCompiler(spark, TableCatalog.for_directory(SF_SMOKE))
    df = comp.compile(p)
    assert {"key", "n_events", "total_value"} <= set(df.columns)
    comp.write_output(p, df, str(tmp_path))
    out = spark.read.parquet(str(tmp_path / "event-type-counts"))
    assert out.count() == df.count()
    assert out.filter(F.col("total_value").isNull()).count() == 0


def test_custom_udaf_example_runs(spark):
    """The bring-your-own-aggregator example: JSON names a UDAF that the
    host registers with the compiler (the reference's FQCN-hook design,
    Spark-idiomatic)."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def price_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    p = load_pipeline_json("examples/custom_udaf_pipeline.json")
    df = BatchCompiler(
        spark,
        TableCatalog.for_directory(SF_SMOKE),
        udfs={"price_range": price_range},
    ).compile(p)
    assert set(df.columns) == {"key", "price_spread"}
    rows = {r["key"]: r for r in df.collect()}
    assert rows and all(r["price_spread"] > 0 for r in rows.values())
