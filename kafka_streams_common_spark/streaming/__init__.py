"""Structured Streaming layer — the streaming execution of the same
declarative pipelines the batch compiler runs (SURVEY.md §7 Phase 3).

The batch DataFrame expressions ARE the streaming expressions; this package
adds the roots (readStream sources), the sinks (writeStream / foreachBatch),
and the one genuinely stateful piece Spark lacks as a primitive: the
KTable-style latest-per-key changelog materialization.
"""

from kafka_streams_common_spark.streaming.runner import (
    StreamingCompiler,
    run_changelog_materialization,
    run_stream_to_memory,
)

__all__ = [
    "StreamingCompiler",
    "run_changelog_materialization",
    "run_stream_to_memory",
]
