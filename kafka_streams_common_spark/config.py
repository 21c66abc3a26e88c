"""Declarative pipeline configuration — the engine's "query language".

Mirrors the reference's config schema (``AggregationDefinition.java:7-130``
in sagarm-traveloka/kafka-streams-common): one JSON object describes a whole
pipeline — processing mode, source, an N-step join chain with per-step field
mappings, group-by aggregation, and output sink config. The reference binds
this with Jackson into POJOs; we bind with plain dataclasses + a validating
loader (the reference's runtime validations live at
``DynamicTopologyBuilder.java:41-43,96-101,144-146``).

Capability-preserving extensions over the reference (cited in SURVEY.md §2.4
and §2.7): ``AggregationSpec`` generalizes the stubbed count aggregation to
the full Spark agg family, and ``filter`` adds a predicate step (absent in
the reference, trivially built-in in Spark).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class ProcessingMode(str, Enum):
    """AggregationDefinition.java:36-40 — the three processing modes."""

    JOIN_CHAIN = "JOIN_CHAIN"
    AGGREGATION = "AGGREGATION"
    SIMPLE_STREAM = "SIMPLE_STREAM"


class JoinType(str, Enum):
    """AggregationDefinition.java:42-46 — LEFT_JOIN / INNER_JOIN, with the
    OUTER variant the reference's comment explicitly defers ("Could add
    OUTER_JOIN later") provided as FULL_OUTER_JOIN. The JSON loader also
    accepts the reference's anticipated spelling ``OUTER_JOIN``.
    """

    LEFT_JOIN = "LEFT_JOIN"
    INNER_JOIN = "INNER_JOIN"
    FULL_OUTER_JOIN = "FULL_OUTER_JOIN"


class MappingSide(str, Enum):
    """AggregationDefinition.java:93-96 — which join side a field comes from."""

    LEFT = "LEFT"
    RIGHT = "RIGHT"


class KeySource(str, Enum):
    """AggregationDefinition.java:106-109 — key extraction source."""

    KEY = "KEY"
    VALUE = "VALUE"


@dataclass(frozen=True)
class SourceDef:
    """A named source table/topic (TopicConfig, AggregationDefinition.java:49-53).

    ``name`` resolves through the :class:`TableCatalog` (SchemaService analog).
    ``key_field`` names the column acting as the Kafka record key. For
    changelog-table semantics (KTable, S2) ``seq_field`` is the
    monotonically-increasing change sequence (the Kafka offset analog) used
    by the latest-per-key view; ``tiebreak_field`` makes ordering total when
    ``seq_field`` has duplicates so results are deterministic.
    """

    name: str
    key_field: str | None = None
    seq_field: str | None = None
    tiebreak_field: str | None = None


@dataclass(frozen=True)
class FieldMapping:
    """One output-field projection rule (AggregationDefinition.java:89-97).

    Semantics preserved from ``DynamicPojoValueJoiner.java:37-66``: copy
    ``source_field`` from the LEFT or RIGHT join side into
    ``output_field``; a null side (unmatched left join) or a missing field
    yields an explicit null output column.
    """

    source: MappingSide
    source_field: str
    output_field: str


@dataclass(frozen=True)
class KeyExtraction:
    """Re-key spec (AggregationDefinition.java:102-110; DynamicPojoKeyExtractor).

    ``source=KEY`` keeps the existing key; ``source=VALUE`` promotes the named
    value field to the key (which in Kafka Streams forces a repartition — in
    Spark the downstream join/groupBy inserts the equivalent shuffle).
    """

    source: KeySource
    field_name: str | None = None


@dataclass(frozen=True)
class JoinStep:
    """One step of a join chain (JoinOperationConfig, AggregationDefinition.java:57-83).

    The right side is always materialized as a table (KTable semantics,
    ``DynamicTopologyBuilder.java:142``); ``broadcast=True`` marks it as a
    GlobalKTable (fully replicated → Spark broadcast join, S3).
    """

    right: SourceDef
    join_type: JoinType
    output_mappings: tuple[FieldMapping, ...]
    broadcast: bool = False
    # Re-key the running left side before THIS join. The reference supports
    # re-keying only before the first join (``primaryKeyExtraction``,
    # AggregationDefinition.java:74-75) and marks per-step transforms as
    # "Future extensions" (:98); per-step re-key is our capability-preserving
    # superset — in Kafka Streams it would be a selectKey + repartition topic,
    # in Spark it is simply the next join's shuffle key.
    key_extraction: KeyExtraction | None = None


@dataclass(frozen=True)
class AggregationSpec:
    """One aggregate in AGGREGATION mode.

    The reference sketches only ``count`` (commented design,
    ``DynamicTopologyBuilder.java:203-221``); the config comment at
    ``AggregationDefinition.java:38`` names the intended family
    ("count, sum, reduce, etc."), which we expose fully.
    """

    fn: str  # count | sum | min | max | avg | count_distinct | approx_count_distinct | collect_list
    source_field: str | None = None  # a column name or any SQL expression
    alias: str | None = None
    cast: str | None = None  # optional result cast (e.g. "double")
    # bring-your-own aggregator: fn names a UDAF registered with the
    # compiler (the reference's commented valueJoinerClass FQCN hook,
    # Spark-idiomatic) — skips the built-in whitelist; the name must be a
    # plain identifier and resolution happens at Spark analysis time
    custom: bool = False

    _SUPPORTED = (
        "count",
        "sum",
        "min",
        "max",
        "avg",
        "count_distinct",
        "approx_count_distinct",
        "collect_list",
        "first",
        "last",
    )

    def output_name(self) -> str:
        if self.alias:
            return self.alias
        return self.fn if self.source_field is None else f"{self.fn}_{self.source_field}"


@dataclass(frozen=True)
class OutputDef:
    """Sink config (OutputTopicConfig, AggregationDefinition.java:112-130).

    ``enabled=False`` elides the sink entirely
    (``DynamicTopologyBuilder.java:61-74``). Provisioning knobs mirror
    ``TopicProvisioner.java:22-55``: partitions default 3, replication 1,
    ``retention_ms == -1`` → compacted (latest-per-key) output,
    ``retention_ms == 0`` → system default.
    """

    name: str
    enabled: bool = True
    partitions: int = 3
    replication_factor: int = 1
    retention_ms: int = 0
    key_alias: str = "key"


@dataclass(frozen=True)
class PipelineDef:
    """One declarative pipeline (AggregationDefinition.java:7-40)."""

    id: str
    mode: ProcessingMode
    source: SourceDef
    description: str = ""
    initial_source_is_stream: bool = True  # AggregationDefinition.java:70
    key_extraction: KeyExtraction | None = None
    join_operations: tuple[JoinStep, ...] = ()
    group_by: KeyExtraction | None = None
    aggregations: tuple[AggregationSpec, ...] = (AggregationSpec(fn="count"),)
    filter: str | None = None  # SQL predicate over source columns (extension)
    output: OutputDef | None = None


class PipelineValidationError(ValueError):
    """Raised on invalid config — the analog of the reference's
    IllegalArgumentException validations (DynamicTopologyBuilder.java:41-57)."""


def validate_pipeline(p: PipelineDef) -> PipelineDef:
    """Stage-2 validation, mirroring SURVEY.md §3.1 step 2."""
    if not p.id:
        raise PipelineValidationError("pipeline id is required")
    if not p.source or not p.source.name:
        # DynamicTopologyBuilder.java:96-101
        raise PipelineValidationError(f"{p.id}: sourceTopic is required")
    if p.mode == ProcessingMode.JOIN_CHAIN:
        if not p.join_operations:
            # DynamicTopologyBuilder.java:96-101
            raise PipelineValidationError(
                f"{p.id}: JOIN_CHAIN requires at least one join operation"
            )
        for i, step in enumerate(p.join_operations):
            if not step.output_mappings:
                # DynamicTopologyBuilder.java:144-146
                raise PipelineValidationError(
                    f"{p.id}: join step {i} has no outputFieldsMapping"
                )
            if not step.right or not step.right.name:
                raise PipelineValidationError(f"{p.id}: join step {i} missing right source")
    elif p.mode == ProcessingMode.AGGREGATION:
        if p.group_by is None:
            # DynamicTopologyBuilder.java:41-43 (groupByKeyExtraction required)
            raise PipelineValidationError(f"{p.id}: AGGREGATION requires group_by")
        if p.group_by.source == KeySource.VALUE and not p.group_by.field_name:
            raise PipelineValidationError(
                f"{p.id}: group_by with source=VALUE requires field_name"
            )
        for a in p.aggregations:
            if a.custom:
                if not a.fn.isidentifier():
                    raise PipelineValidationError(
                        f"{p.id}: custom aggregation fn {a.fn!r} must be an identifier"
                    )
                if not a.source_field:
                    raise PipelineValidationError(
                        f"{p.id}: custom aggregation {a.fn!r} requires source_field"
                    )
            elif a.fn not in AggregationSpec._SUPPORTED:
                raise PipelineValidationError(f"{p.id}: unsupported aggregation fn {a.fn!r}")
            if a.fn != "count" and not a.source_field:
                raise PipelineValidationError(f"{p.id}: aggregation {a.fn} needs source_field")
    elif p.mode == ProcessingMode.SIMPLE_STREAM:
        pass
    else:  # pragma: no cover — enum exhausts, mirrors :56-57 default branch
        raise PipelineValidationError(f"{p.id}: unknown processing mode {p.mode}")
    if p.key_extraction and p.key_extraction.source == KeySource.VALUE:
        if not p.key_extraction.field_name:
            raise PipelineValidationError(
                f"{p.id}: key_extraction with source=VALUE requires field_name"
            )
    return p


# ---------------------------------------------------------------------------
# JSON loader — the reference leaves binding to Jackson in host apps; we own it.
# ---------------------------------------------------------------------------

def _source_from(obj: dict[str, Any] | str) -> SourceDef:
    if isinstance(obj, str):
        return SourceDef(name=obj)
    return SourceDef(
        name=obj["name"],
        key_field=obj.get("keyField") or obj.get("key_field"),
        seq_field=obj.get("seqField") or obj.get("seq_field"),
        tiebreak_field=obj.get("tiebreakField") or obj.get("tiebreak_field"),
    )


def _key_extraction_from(obj: dict[str, Any] | None) -> KeyExtraction | None:
    if obj is None:
        return None
    return KeyExtraction(
        source=KeySource(obj.get("source", "VALUE")),
        field_name=obj.get("fieldName") or obj.get("field_name"),
    )


def load_pipeline(obj: dict[str, Any]) -> PipelineDef:
    """Bind a parsed JSON dict into a validated :class:`PipelineDef`.

    Accepts both camelCase (reference JSON style) and snake_case keys.
    """

    def get(*names: str, default: Any = None) -> Any:
        for n in names:
            if n in obj:
                return obj[n]
        return default

    joins: list[JoinStep] = []
    def _join_type_from(raw: str) -> JoinType:
        # the reference's deferred-OUTER comment anticipates "OUTER_JOIN"
        return JoinType("FULL_OUTER_JOIN" if raw == "OUTER_JOIN" else raw)

    for j in get("joinOperations", "join_operations", default=[]) or []:
        mappings = tuple(
            FieldMapping(
                source=MappingSide(m.get("source", "LEFT")),
                source_field=m.get("sourceFieldName") or m.get("source_field"),
                output_field=m.get("outputFieldName") or m.get("output_field"),
            )
            for m in j.get("outputFieldsMapping") or j.get("output_mappings") or []
        )
        joins.append(
            JoinStep(
                right=_source_from(
                    j.get("enrichmentTopic") or j.get("rightTopic") or j.get("right")
                ),
                join_type=_join_type_from(
                    j.get("type") or j.get("joinType") or j.get("join_type") or "LEFT_JOIN"
                ),
                output_mappings=mappings,
                broadcast=bool(j.get("broadcast", False)),
                key_extraction=_key_extraction_from(
                    j.get("keyExtraction") or j.get("key_extraction")
                ),
            )
        )

    aggs = tuple(
        AggregationSpec(
            fn=a.get("fn", "count"),
            source_field=a.get("sourceField") or a.get("source_field"),
            alias=a.get("alias"),
            cast=a.get("cast"),
            custom=bool(a.get("custom", False)),
        )
        for a in get("aggregations", default=[{"fn": "count"}]) or [{"fn": "count"}]
    )

    out_obj = get("outputTopic", "output")
    output = None
    if out_obj:
        output = OutputDef(
            name=out_obj["name"],
            enabled=bool(out_obj.get("enabled", True)),
            partitions=int(out_obj.get("partitions", 3)),
            replication_factor=int(
                out_obj.get("replicationFactor", out_obj.get("replication_factor", 1))
            ),
            retention_ms=int(out_obj.get("retentionMs", out_obj.get("retention_ms", 0))),
            key_alias=out_obj.get("keyAlias", out_obj.get("key_alias", "key")),
        )

    p = PipelineDef(
        id=get("id", "aggregationId", "aggregation_id"),
        description=get("description", default="") or "",
        mode=ProcessingMode(get("processingMode", "mode", default="SIMPLE_STREAM")),
        source=_source_from(get("sourceTopic", "source")),
        initial_source_is_stream=bool(
            get("initialSourceIsStream", "initial_source_is_stream", default=True)
        ),
        key_extraction=_key_extraction_from(get("keyExtraction", "key_extraction")),
        join_operations=tuple(joins),
        group_by=_key_extraction_from(get("groupByKeyExtraction", "group_by")),
        aggregations=aggs,
        filter=get("filter"),
        output=output,
    )
    return validate_pipeline(p)


def load_pipeline_json(text_or_path: str) -> PipelineDef:
    """Load a pipeline from a JSON string or a path to a JSON file."""
    if text_or_path.lstrip().startswith("{"):
        return load_pipeline(json.loads(text_or_path))
    with open(text_or_path, encoding="utf-8") as fh:
        return load_pipeline(json.load(fh))
