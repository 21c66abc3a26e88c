"""Behavioral edge tests mirroring reference semantics (SURVEY.md §5 item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler
from kafka_streams_common_spark.config import (
    FieldMapping,
    JoinStep,
    JoinType,
    KeyExtraction,
    KeySource,
    MappingSide,
    PipelineDef,
    ProcessingMode,
    SourceDef,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def compiler(spark):
    return BatchCompiler(spark, TableCatalog.for_directory(SF_SMOKE))


def _chain(join_type, mappings, key_field="o_custkey"):
    return PipelineDef(
        id="t",
        mode=ProcessingMode.JOIN_CHAIN,
        source=SourceDef(name="orders"),
        key_extraction=KeyExtraction(source=KeySource.VALUE, field_name=key_field),
        join_operations=(
            JoinStep(
                right=SourceDef(name="customer"),
                join_type=join_type,
                output_mappings=tuple(mappings),
            ),
        ),
    )


def test_left_join_null_fills_unmatched_right(compiler, spark):
    """J2 + P1: unmatched left-join rows carry null right-side fields
    (DynamicPojoValueJoiner.java:40-41,59-63)."""
    # keying orders by o_orderkey: customer has keys 1..N_cust < N_orders,
    # so high order keys find no customer
    p = _chain(
        JoinType.LEFT_JOIN,
        [
            FieldMapping(MappingSide.LEFT, "o_orderkey", "order_id"),
            FieldMapping(MappingSide.RIGHT, "c_name", "customer_name"),
        ],
        key_field="o_orderkey",
    )
    df = compiler.compile(p)
    total = df.count()
    unmatched = df.filter(F.col("customer_name").isNull()).count()
    assert total == 1500  # left join preserves all stream records
    assert unmatched > 0


def test_inner_join_drops_unmatched(compiler):
    """J1: inner join drops stream records with no table match
    (DynamicTopologyBuilder.java:158-161)."""
    p = _chain(
        JoinType.INNER_JOIN,
        [FieldMapping(MappingSide.LEFT, "o_orderkey", "order_id")],
        key_field="o_orderkey",
    )
    df = compiler.compile(p)
    assert 0 < df.count() < 1500


def test_full_outer_join_keeps_both_unmatched_sides(compiler):
    """FULL_OUTER_JOIN (closes AggregationDefinition.java:42-46's deferred
    OUTER): unmatched rows of BOTH sides survive, with the running key
    coalesced from whichever side matched."""
    # right-only direction: events.user_id spans 0..14 at sf0.001 while
    # customer keys span 0..149 — customers 15..149 have no events
    p = PipelineDef(
        id="t-outer",
        mode=ProcessingMode.JOIN_CHAIN,
        source=SourceDef(name="events"),
        key_extraction=KeyExtraction(source=KeySource.VALUE, field_name="user_id"),
        join_operations=(
            JoinStep(
                right=SourceDef(name="customer"),
                join_type=JoinType.FULL_OUTER_JOIN,
                output_mappings=(
                    FieldMapping(MappingSide.LEFT, "event_id", "event_id"),
                    FieldMapping(MappingSide.RIGHT, "c_name", "customer_name"),
                ),
            ),
        ),
    )
    df = compiler.compile(p)
    assert df.filter(F.col("event_id").isNull()).count() > 0  # custs 15..149
    assert df.filter(F.col("key").isNull()).count() == 0  # key coalesces

    # left-only direction: orders keyed by o_orderkey (sparse, up to ~6k)
    # against customer keys 0..149 — high order keys find no customer
    p2 = _chain(
        JoinType.FULL_OUTER_JOIN,
        [
            FieldMapping(MappingSide.LEFT, "o_orderkey", "order_id"),
            FieldMapping(MappingSide.RIGHT, "c_name", "customer_name"),
        ],
        key_field="o_orderkey",
    )
    df2 = compiler.compile(p2)
    assert df2.filter(F.col("customer_name").isNull()).count() > 0
    assert df2.filter(F.col("key").isNull()).count() == 0


def test_config_loader_accepts_deferred_outer_join_spelling():
    """The reference comment anticipates the literal \"OUTER_JOIN\"; the
    JSON loader normalizes it to FULL_OUTER_JOIN."""
    from kafka_streams_common_spark.config import load_pipeline

    p = load_pipeline(
        {
            "id": "outer-test",
            "processingMode": "JOIN_CHAIN",
            "sourceTopic": {"name": "orders"},
            "joinOperations": [
                {
                    "enrichmentTopic": {"name": "customer"},
                    "type": "OUTER_JOIN",
                    "outputFieldsMapping": [
                        {
                            "source": "LEFT",
                            "sourceFieldName": "o_orderkey",
                            "outputFieldName": "order_id",
                        }
                    ],
                }
            ],
        }
    )
    assert p.join_operations[0].join_type == JoinType.FULL_OUTER_JOIN


def test_missing_mapped_field_yields_null_column(compiler):
    """P1 contract: a configured source field absent from the schema becomes
    an explicit null output column (DynamicPojoValueJoiner.java:59-63)."""
    p = _chain(
        JoinType.LEFT_JOIN,
        [
            FieldMapping(MappingSide.LEFT, "o_orderkey", "order_id"),
            FieldMapping(MappingSide.RIGHT, "ghost", "ghost_out"),
        ],
    )
    df = compiler.compile(p)
    assert "ghost_out" in df.columns
    assert df.filter(F.col("ghost_out").isNotNull()).count() == 0


def test_rekey_missing_field_keeps_records_with_null_key(compiler):
    """P2: null value during key extraction → null key, record retained
    (DynamicPojoKeyExtractor.java:46-49)."""
    p = PipelineDef(
        id="t",
        mode=ProcessingMode.SIMPLE_STREAM,
        source=SourceDef(name="orders"),
        key_extraction=KeyExtraction(source=KeySource.VALUE, field_name="nope"),
    )
    df = compiler.compile(p)
    assert df.count() == 1500
    assert df.filter(F.col("key").isNotNull()).count() == 0


def test_shared_table_materialized_once(compiler):
    """J6: one table view per source per compiler (KTableRegistry.java:26)."""
    t1 = compiler.registry.table(SourceDef(name="customer"))
    t2 = compiler.registry.table(SourceDef(name="customer"))
    assert t1 is t2


def test_filter_step(compiler):
    p = PipelineDef(
        id="t",
        mode=ProcessingMode.SIMPLE_STREAM,
        source=SourceDef(name="orders"),
        filter="o_orderstatus = 'F'",
    )
    df = compiler.compile(p)
    assert df.select(F.countDistinct("o_orderstatus")).collect()[0][0] == 1


def test_sink_gating_and_compaction(compiler, tmp_path):
    """S4 sink gate (DynamicTopologyBuilder.java:61-74) + retention_ms=-1
    compaction (TopicProvisioner.java:38-40)."""
    from kafka_streams_common_spark.config import OutputDef

    p = PipelineDef(
        id="t",
        mode=ProcessingMode.SIMPLE_STREAM,
        source=SourceDef(name="events"),
        output=OutputDef(name="disabled-out", enabled=False),
    )
    df = compiler.compile(p)
    compiler.write_output(p, df, str(tmp_path))
    assert not (tmp_path / "disabled-out").exists()

    p2 = PipelineDef(
        id="t2",
        mode=ProcessingMode.SIMPLE_STREAM,
        source=SourceDef(name="events"),
        output=OutputDef(name="compacted-out", enabled=True, retention_ms=-1),
    )
    df2 = compiler.compile(p2)
    compiler.write_output(p2, df2, str(tmp_path))
    out = compiler.spark.read.parquet(str(tmp_path / "compacted-out"))
    # compacted: exactly one row per key survives
    assert out.count() == out.select("key").distinct().count()
