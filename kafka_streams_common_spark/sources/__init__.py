"""Source/sink connectors beyond the local parquet catalog."""

from kafka_streams_common_spark.sources.kafka import (
    kafka_sink_writer,
    kafka_stream_source,
    parse_json_value,
    serialize_to_kafka,
)
from kafka_streams_common_spark.sources.admin import ensure_topic

__all__ = [
    "ensure_topic",
    "kafka_sink_writer",
    "kafka_stream_source",
    "parse_json_value",
    "serialize_to_kafka",
]
