"""kafka_streams_common_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference library
``sagarm-traveloka/kafka-streams-common`` (a declarative, JSON-config-driven
Kafka Streams topology builder), re-expressed Spark-first.

Architecture (see SURVEY.md):

- ``config``     — the declarative "query language": dataclasses mirroring the
                   reference's ``AggregationDefinition`` config schema.
- ``catalog``    — source-name → (path/format/schema/key) registry; the analog
                   of the reference's ``SchemaService`` + topic configs.
- ``registry``   — memoized source materialization (``KTableRegistry`` analog).
- ``compiler``   — lowers a ``PipelineDef`` into a DataFrame plan (batch) or a
                   Structured Streaming plan (``streaming`` package).
- ``operators``  — first-class extension operators: dedup (exact/minhash/
                   simhash/ngram-jaccard/embedding), similarity search,
                   text analysis, multimodal column plumbing.
- ``functions``  — reusable column-expression helpers (JSON, vectors, text).

Everything is declared through the public DataFrame API so Catalyst performs
pushdown/pruning/join-selection; no RDDs, no driver-side loops.
"""

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
    load_pipeline,
    load_pipeline_json,
)
from kafka_streams_common_spark.catalog import TableCatalog
from kafka_streams_common_spark.compiler import BatchCompiler
from kafka_streams_common_spark.registry import SourceRegistry
from kafka_streams_common_spark.session import get_spark

__all__ = [
    "AggregationSpec",
    "BatchCompiler",
    "FieldMapping",
    "JoinStep",
    "JoinType",
    "KeyExtraction",
    "KeySource",
    "MappingSide",
    "OutputDef",
    "PipelineDef",
    "ProcessingMode",
    "SourceDef",
    "SourceRegistry",
    "TableCatalog",
    "get_spark",
    "load_pipeline",
    "load_pipeline_json",
]

__version__ = "0.1.0"
