"""Canonical pipeline definitions used by the entry point, tests, and bench.

``enriched_orders`` is the exact pipeline the reference's mock schema catalog
describes (SchemaService.java:30-33: topics ``order`` / ``user`` /
``enriched-orders`` — an order-stream enriched against a user table), mapped
onto the driver fixtures: orders stream ⟕ customer table ⟕ nation table with
per-step field-mapping projection (J5 chain of J2 steps + P1 + P2 re-key).
"""

from __future__ import annotations

from kafka_streams_common_spark.config import (
    AggregationSpec,
    FieldMapping,
    JoinStep,
    JoinType,
    KeyExtraction,
    KeySource,
    MappingSide,
    OutputDef,
    PipelineDef,
    ProcessingMode,
    SourceDef,
)

L, R = MappingSide.LEFT, MappingSide.RIGHT


def _fm(side: MappingSide, src: str, out: str | None = None) -> FieldMapping:
    return FieldMapping(source=side, source_field=src, output_field=out or src)


ENRICHED_ORDERS = PipelineDef(
    id="enriched-orders",
    description=(
        "orders stream re-keyed to o_custkey, left-joined to the customer "
        "table, then re-joined through c_nationkey to nation — the "
        "SchemaService.java:30-33 enrichment pipeline over driver fixtures"
    ),
    mode=ProcessingMode.JOIN_CHAIN,
    source=SourceDef(name="orders"),
    initial_source_is_stream=True,
    # selectKey(o_custkey) before the first join (P2)
    key_extraction=KeyExtraction(source=KeySource.VALUE, field_name="o_custkey"),
    join_operations=(
        JoinStep(
            right=SourceDef(name="customer"),
            join_type=JoinType.LEFT_JOIN,
            broadcast=True,  # GlobalKTable-style dim (S3)
            output_mappings=(
                _fm(L, "o_orderkey"),
                _fm(L, "o_totalprice"),
                _fm(L, "o_orderstatus"),
                _fm(R, "c_name", "customer_name"),
                _fm(R, "c_acctbal", "customer_acctbal"),
                _fm(R, "c_nationkey", "nation_key"),
            ),
        ),
        JoinStep(
            right=SourceDef(name="nation", key_field="n_nationkey"),
            join_type=JoinType.LEFT_JOIN,
            broadcast=True,
            key_extraction=KeyExtraction(source=KeySource.VALUE, field_name="nation_key"),
            output_mappings=(
                _fm(L, "o_orderkey"),
                _fm(L, "o_totalprice"),
                _fm(L, "o_orderstatus"),
                _fm(L, "customer_name"),
                _fm(L, "customer_acctbal"),
                _fm(R, "n_name", "nation_name"),
            ),
        ),
    ),
    output=OutputDef(name="enriched-orders", key_alias="key"),
)

ORDER_COUNTS_BY_CUSTOMER = PipelineDef(
    id="order-counts-by-customer",
    description="AGGREGATION mode (A1 generalized): orders grouped by o_custkey",
    mode=ProcessingMode.AGGREGATION,
    source=SourceDef(name="orders"),
    group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_custkey"),
    aggregations=(
        AggregationSpec(fn="count", alias="order_count"),
        AggregationSpec(fn="sum", source_field="o_totalprice", alias="total_spend"),
    ),
    output=OutputDef(name="order-counts", key_alias="key"),
)

EVENTS_PASSTHROUGH = PipelineDef(
    id="events-passthrough",
    description="SIMPLE_STREAM mode: pass-through with peek/observe tap (P6)",
    mode=ProcessingMode.SIMPLE_STREAM,
    source=SourceDef(name="events"),
    output=OutputDef(name="events-copy", key_alias="key"),
)
