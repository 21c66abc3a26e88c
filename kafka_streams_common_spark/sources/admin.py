"""Topic provisioning — the ``TopicProvisioner`` analog
(TopicProvisioner.java:22-55).

Semantics preserved: partitions default 3, replication factor default 1
(:33-34); ``retention_ms == -1`` → compacted topic (:38-40);
``retention_ms == 0`` → broker default (:41); already-exists tolerated
(:49-51). The Kafka admin client is import-gated (no broker/client in this
container); :func:`ensure_output_table` is the batch-catalog equivalent
(CREATE TABLE IF NOT EXISTS).
"""

from __future__ import annotations

import os

from kafka_streams_common_spark.config import OutputDef


def ensure_topic(out: OutputDef, bootstrap_servers: str) -> bool:
    """Create the sink topic if missing. Returns True when created, False
    when it already existed. Requires a Kafka admin client package."""
    if not out.enabled:
        return False  # gate mirrors TopicProvisioner.java:23-25
    try:
        from kafka.admin import KafkaAdminClient, NewTopic  # type: ignore
        from kafka.errors import TopicAlreadyExistsError  # type: ignore
    except ImportError as exc:  # import-gated per environment constraints
        raise RuntimeError(
            "no Kafka admin client available; install kafka-python (or use "
            "ensure_output_table for the batch catalog)"
        ) from exc

    configs: dict[str, str] = {}
    if out.retention_ms == -1:
        configs["cleanup.policy"] = "compact"  # TopicProvisioner.java:38-40
    elif out.retention_ms > 0:
        configs["retention.ms"] = str(out.retention_ms)

    admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
    try:
        admin.create_topics(
            [
                NewTopic(
                    name=out.name,
                    num_partitions=out.partitions,
                    replication_factor=out.replication_factor,
                    topic_configs=configs,
                )
            ]
        )
        return True
    except TopicAlreadyExistsError:
        return False  # idempotent, TopicProvisioner.java:49-51
    finally:
        admin.close()


def ensure_output_table(out: OutputDef, root: str) -> str:
    """Batch-catalog DDL: ensure the output directory exists (CREATE TABLE
    IF NOT EXISTS semantics for the parquet catalog). Returns the path."""
    path = os.path.join(root, out.name)
    if out.enabled:
        os.makedirs(path, exist_ok=True)
    return path
