"""Config binding + validation tests — mirrors the reference's runtime
validations (DynamicTopologyBuilder.java:41-43,96-101,144-146)."""

from __future__ import annotations

import pytest

from kafka_streams_common_spark.config import (
    FieldMapping,
    JoinStep,
    JoinType,
    KeyExtraction,
    KeySource,
    MappingSide,
    PipelineDef,
    PipelineValidationError,
    ProcessingMode,
    SourceDef,
    load_pipeline,
    validate_pipeline,
)


def _mapping():
    return FieldMapping(MappingSide.LEFT, "a", "a")


def test_join_chain_requires_steps():
    p = PipelineDef(
        id="x", mode=ProcessingMode.JOIN_CHAIN, source=SourceDef(name="orders")
    )
    with pytest.raises(PipelineValidationError):
        validate_pipeline(p)


def test_join_step_requires_mappings():
    p = PipelineDef(
        id="x",
        mode=ProcessingMode.JOIN_CHAIN,
        source=SourceDef(name="orders"),
        join_operations=(
            JoinStep(
                right=SourceDef(name="customer"),
                join_type=JoinType.LEFT_JOIN,
                output_mappings=(),
            ),
        ),
    )
    with pytest.raises(PipelineValidationError):
        validate_pipeline(p)


def test_aggregation_requires_group_by():
    p = PipelineDef(
        id="x", mode=ProcessingMode.AGGREGATION, source=SourceDef(name="orders"),
        group_by=None,
    )
    with pytest.raises(PipelineValidationError):
        validate_pipeline(p)


def test_unknown_agg_fn_rejected():
    from kafka_streams_common_spark.config import AggregationSpec

    p = PipelineDef(
        id="x",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="orders"),
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_custkey"),
        aggregations=(AggregationSpec(fn="median_of_medians"),),
    )
    with pytest.raises(PipelineValidationError):
        validate_pipeline(p)


def test_load_pipeline_reference_json_shape():
    """Bind a config in the reference's camelCase JSON dialect
    (AggregationDefinition.java field names)."""
    obj = {
        "id": "customer-orders-enrichment",
        "processingMode": "JOIN_CHAIN",
        "sourceTopic": {"name": "orders", "keyField": "o_orderkey"},
        "keyExtraction": {"source": "VALUE", "fieldName": "o_custkey"},
        "joinOperations": [
            {
                "type": "LEFT_JOIN",
                "enrichmentTopic": {"name": "customer", "keyField": "c_custkey"},
                "outputFieldsMapping": [
                    {"source": "LEFT", "sourceFieldName": "o_orderkey", "outputFieldName": "order_id"},
                    {"source": "RIGHT", "sourceFieldName": "c_name", "outputFieldName": "customer_name"},
                ],
            }
        ],
        "outputTopic": {"name": "enriched-orders", "enabled": True, "retentionMs": -1},
    }
    p = load_pipeline(obj)
    assert p.mode == ProcessingMode.JOIN_CHAIN
    assert p.key_extraction.field_name == "o_custkey"
    assert p.join_operations[0].join_type == JoinType.LEFT_JOIN
    assert p.join_operations[0].output_mappings[1].output_field == "customer_name"
    assert p.output.retention_ms == -1
    assert p.output.partitions == 3  # TopicProvisioner.java:33 default


def test_load_pipeline_json_string_roundtrip():
    import json

    from kafka_streams_common_spark.config import load_pipeline_json

    obj = {
        "id": "pass",
        "processingMode": "SIMPLE_STREAM",
        "sourceTopic": "events",
    }
    p = load_pipeline_json(json.dumps(obj))
    assert p.mode == ProcessingMode.SIMPLE_STREAM
    assert p.source.name == "events"
