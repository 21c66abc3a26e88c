"""Kafka-serde queries: the binary message encodings a real Kafka
deployment carries — Avro object-container files, Confluent
schema-registry framed messages (with live schema evolution), and
protobuf wire-format messages — each encoded from a fixture table and
decoded back by the from-scratch codecs in ``operators/avro.py`` /
``operators/protowire.py``, with the SQL oracle replaying the payload
derivation so the hash gates the codec end to end (the multimodal
tier's pattern applied to the reference's own domain: the reference's
serde surface is JSON-only, ``SerdeFactory.java:48-82``; these are the
serdes its users actually put on topics next).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.queries.registry import query, table


@query(
    "kafka_avro_ocf_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
           CASE WHEN o_orderkey % 7 <> 0 THEN o_orderpriority END AS priority,
           CAST(o_orderkey % 64 AS BIGINT) AS container_id,
           CASE WHEN (o_orderkey % 64) % 2 = 0 THEN 'deflate'
                ELSE 'null' END AS codec
    FROM orders
    """,
)
def kafka_avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVRO object-container-file roundtrip (r14) — the at-rest format
    Kafka data lands in: orders are written into genuine OCF
    containers (one per ``o_orderkey % 64``; magic, metadata map,
    16-byte sync verified per block; 50-record blocks so multi-block
    walks are real; EVEN containers raw-DEFLATE compressed, odd ones
    ``null`` codec; ``priority`` a ``["null","string"]`` union, null
    on every 7th key) and decoded back row-for-row by the from-scratch
    reader. The oracle replays every recovered column — key fields,
    the union's null pattern, the container id, and the codec the FILE
    declares — straight from ``orders``, so one wrong varint, union
    branch, sync check, or inflate breaks the hash. One
    container-forming shuffle on encode (the topic-partition shape);
    decode is map-only."""
    from kafka_streams_common_spark.operators.avro import (
        decode_orders_ocf,
        encode_orders_ocf,
    )

    orders = table(spark, sf_dir, "orders")
    return decode_orders_ocf(encode_orders_ocf(orders))


@query(
    "kafka_confluent_avro_decode",
    oracle="""
    SELECT event_id, event_type, value,
           CASE WHEN event_id % 3 = 0 THEN 'unknown'
                ELSE 'u' || CAST(user_id AS VARCHAR) END AS source,
           CAST(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 2 END AS INT)
               AS schema_id
    FROM events
    """,
)
def kafka_confluent_avro_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFLUENT wire-format decode with live schema evolution (r14) —
    the per-message consumer path of a schema-registry fleet: every
    third event is framed by the OLD producer (schema id 1, no
    ``source`` field), the rest by the NEW one (schema id 2, which
    ALSO carries a ``debug`` field the consumer has never seen); the
    decoder unframes (magic byte + big-endian schema id), looks the
    writer schema up by id, and schema-RESOLVES each body against the
    reader schema — defaults filled for old messages, unknown fields
    decoded and discarded for new ones. The oracle replays the
    id split, the default fill, and the field passthroughs from
    ``events``. Map-only Arrow stages both directions."""
    from kafka_streams_common_spark.operators.avro import (
        decode_events_confluent,
        encode_events_confluent,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_confluent(encode_events_confluent(events))


@query(
    "kafka_protobuf_decode",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, value, user_id,
             md5(event_type || '-' || CAST(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id, event_type, value,
           CAST(user_id - 500 AS BIGINT) AS delta,
           'u' || CAST(user_id AS VARCHAR) AS source,
           CAST(event_id % 1000 AS BIGINT) AS tag32,
           CAST(('0x' || substr(hx, 1, 2))::INT
              + ('0x' || substr(hx, 3, 2))::INT
              + ('0x' || substr(hx, 5, 2))::INT
              + ('0x' || substr(hx, 7, 2))::INT AS BIGINT) AS packed_sum,
           CAST(4 AS INT) AS packed_n
    FROM m
    """,
)
def kafka_protobuf_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROTOBUF wire-format decode (r14) — no protobuf runtime exists
    in this container, so the wire format itself is implemented from
    the public encoding spec: each event becomes one message (varint
    id, utf-8 string, IEEE double, ZIGZAG sint delta that goes
    negative for half the user ids, a NESTED Meta message, a PACKED
    repeated varint of four md5 bytes, and a trace field the consumer
    spec does not know — fixed64 on even ids, length-delimited on odd
    ids). The old-consumer decode skips both unknown wire shapes,
    un-zigzags, opens the nested message, and folds the packed list to
    (sum, count); the oracle replays all of it from ``events`` + md5
    arithmetic, so tag parsing, zigzag, nesting, packing, AND the
    skip paths are each load-bearing for the hash. Map-only."""
    from kafka_streams_common_spark.operators.protowire import (
        decode_events_proto,
        encode_events_proto,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_proto(encode_events_proto(events))


@query(
    "kafka_avro_map_decode",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             md5(event_type || '-' || CAST(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id, k, CAST(user_id AS BIGINT) AS u,
           CASE WHEN event_id % 3 <> 0
                THEN CAST(event_id % 7 AS BIGINT) END AS t,
           CAST(CASE WHEN event_id % 3 = 0 THEN 2 ELSE 3 END AS INT)
               AS n_props,
           CAST(('0x' || substr(hx, 1, 2))::INT
              + ('0x' || substr(hx, 3, 2))::INT
              + ('0x' || substr(hx, 5, 2))::INT AS BIGINT) AS tags_sum,
           CAST(3 AS INT) AS n_tags
    FROM m
    """,
)
def kafka_avro_map_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVRO map/array decode in the hostile wire forms (r14 wave 3b) —
    collections are where foreign Avro actually breaks naive readers:
    each event ships a Confluent-framed record whose props MAP is
    CHAINED across two blocks whenever it has three entries (the
    third, ``t``, present only when ``event_id % 3 != 0`` — so the
    reader sees 1-block and 2-block maps mixed in every batch) and
    whose tags ARRAY uses the NEGATIVE-count-plus-byte-size block on
    even ids (the skippable form writers emit for large blocks) and
    the positive form on odd ids. The generic reader must walk chained
    blocks, honor negative counts, and terminate on the 0 block; the
    oracle replays map membership, entry counts, and the array fold
    from ``events`` + md5 arithmetic. Map-only both directions."""
    from kafka_streams_common_spark.operators.avro import (
        decode_events_avro_props,
        encode_events_avro_props,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_avro_props(encode_events_avro_props(events))


@query(
    "kafka_msgpack_decode",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, value, user_id,
             md5(event_type || '-' || CAST(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id, event_type, value,
           CAST(user_id - 500 AS BIGINT) AS delta,
           'u' || CAST(user_id AS VARCHAR) AS source,
           CAST(('0x' || substr(hx, 1, 2))::INT
              + ('0x' || substr(hx, 3, 2))::INT
              + ('0x' || substr(hx, 5, 2))::INT AS BIGINT) AS tags_sum,
           CAST(3 AS INT) AS n_tags,
           CAST(('0x' || substr(hx, 9, 2))::INT
              + ('0x' || substr(hx, 11, 2))::INT
              + ('0x' || substr(hx, 13, 2))::INT
              + ('0x' || substr(hx, 15, 2))::INT AS BIGINT) AS blob_sum,
           event_id % 2 = 0 AS flagged,
           CASE WHEN event_id % 5 <> 0
                THEN 'note-' || CAST(event_id % 97 AS VARCHAR) END AS note
    FROM m
    """,
)
def kafka_msgpack_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MESSAGEPACK wire-format decode (r14 wave 4) — the schema-less
    binary serde fluentd/Go/Rust producers put on topics: each event
    becomes one msgpack map (nested ``meta`` map, bin8 blob, nil/bool,
    float64) with a DELIBERATE hostile-width policy — even ids pad
    ``id`` to uint32, ``%3`` ids force str8 + array16, ``%4`` ids
    force map16 — because the spec permits any width that holds the
    value and canonical-only readers are wrong. The generic decoder
    walks every family in the spec; the oracle replays all ten columns
    (signed deltas, md5-byte tag/blob sums, the nil-note pattern) from
    ``events``, so one misread marker or width breaks the hash.
    Map-only Arrow stages both directions."""
    from kafka_streams_common_spark.operators.msgpack import (
        decode_events_msgpack,
        encode_events_msgpack,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_msgpack(encode_events_msgpack(events))


@query(
    "kafka_cbor_decode",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, value, user_id,
             md5(event_type || '-' || CAST(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id, event_type, value,
           CAST((event_id % 8) * 0.25 AS DOUBLE) AS half,
           CAST(user_id - 500 AS BIGINT) AS delta,
           ('0x' || substr(hx, 1, 14))::BIGINT AS bignum,
           CAST(('0x' || substr(hx, 1, 2))::INT
              + ('0x' || substr(hx, 3, 2))::INT
              + ('0x' || substr(hx, 5, 2))::INT AS BIGINT) AS tags_sum,
           CAST(3 AS INT) AS n_tags,
           CASE WHEN event_id % 5 <> 0
                THEN 'note-' || CAST(event_id % 97 AS VARCHAR) END AS note,
           event_id % 2 = 0 AS flagged,
           CASE WHEN event_id % 2 = 0 THEN 'indef' ELSE 'def' END AS map_form
    FROM m
    """,
)
def kafka_cbor_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBOR (RFC 8949) decode in the hostile wire forms (r14 wave 4) —
    the wire features MessagePack lacks, all live in every batch:
    INDEFINITE-length top-level maps (even ids, break-terminated),
    indefinite tags arrays, chunked indefinite TEXT strings (``%3``
    ids), HALF-PRECISION floats (the appendix-D ladder, pinned against
    ``struct`` on all 65536 bit patterns in pytest), tag-2 BIGNUMS
    (7 md5 bytes as a big-endian byte-string integer), major-type-1
    negatives, and 4-byte-padded arguments (``%4`` ids). ``map_form``
    reads the actual first wire byte, so the even/odd indefinite
    policy is itself oracle-gated. Map-only Arrow stages."""
    from kafka_streams_common_spark.operators.cbor import (
        decode_events_cbor,
        encode_events_cbor,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_cbor(encode_events_cbor(events))


@query(
    "kafka_thrift_decode",
    oracle="""
    WITH m AS (
      SELECT event_id, event_type, value, user_id,
             md5(event_type || '-' || CAST(event_id AS VARCHAR)) AS hx
      FROM events
    )
    SELECT event_id, event_type, value,
           CAST(user_id - 500 AS BIGINT) AS delta,
           'u' || CAST(user_id AS VARCHAR) AS source,
           CAST(event_id % 1000 - 500 AS BIGINT) AS tag16,
           event_id % 2 = 0 AS flag,
           CAST(list_sum([('0x' || substr(hx, 2 * i + 1, 2))::INT
                          FOR i IN generate_series(
                              0, CASE WHEN event_id % 2 = 0
                                      THEN 15 ELSE 3 END)]) AS BIGINT)
               AS token_sum,
           CAST(CASE WHEN event_id % 2 = 0 THEN 16 ELSE 4 END AS INT)
               AS token_n,
           CAST(len(list_distinct([('0x' || substr(hx, 2 * i + 1, 2))::INT
                                   FOR i IN generate_series(0, 3)])) AS INT)
               AS set_n,
           CAST(CASE WHEN event_id % 5 = 0 THEN 0 ELSE 2 END AS INT) AS map_n,
           CASE WHEN event_id % 5 <> 0 THEN CAST(user_id AS BIGINT) END AS map_u
    FROM m
    """,
)
def kafka_thrift_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THRIFT COMPACT-PROTOCOL decode (r14 wave 4) — the third schema'd
    Kafka serde family, implemented from the public
    thrift-compact-protocol.md spec with no thrift runtime: short-form
    field headers packing the 1-15 field-id DELTA with the type nibble
    (a delta-2 jump reaches the nested Meta struct), the long-form
    escape (zero nibble + zigzag field id) carrying BOTH unknown trace
    fields — a double on even ids and a nested STRUCT on odd ids, so
    the flat and the RECURSIVE skip paths are each load-bearing —
    header-carried bools (TRUE and FALSE type nibbles both ship),
    zigzag i16/i32/i64 (``delta`` and ``tag16`` go negative), a
    16-element i32 list forcing the LONG-FORM size on even ids vs the
    packed short form on odd, a SET of distinct md5 bytes, the
    single-0x00-byte empty-map form on ids divisible by 5, and
    little-endian doubles (the THRIFT-2799 byte-order trap pinned).
    The oracle replays every column from ``events`` + md5 arithmetic.
    Map-only Arrow stages both directions."""
    from kafka_streams_common_spark.operators.thriftcompact import (
        decode_events_thrift,
        encode_events_thrift,
    )

    events = table(spark, sf_dir, "events")
    return decode_events_thrift(encode_events_thrift(events))
