"""Named query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 gets a named entry here: a
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet fixtures. ``__spark_entry__``
re-exports these; tests assert Spark-vs-DuckDB parity locally the same way
the driver does (row count + schema + order-insensitive value hash).

Float-sum discipline: aggregates over doubles are computed exactly via
DECIMAL(18,2) then cast back to double on BOTH sides, so hashes cannot drift
with partial-aggregation order at any scale/parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.config import (
    AggregationSpec,
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
from kafka_streams_common_spark.pipelines import (
    ENRICHED_ORDERS,
    EVENTS_PASSTHROUGH,
    ORDER_COUNTS_BY_CUSTOMER,
)
from kafka_streams_common_spark.queries.registry import compiler_for, query


# The latest-per-key CTE used by every oracle that consumes the events table
# as a changelog (KTable/S2 semantics): max (ts, event_id) per user_id.
LATEST_EVENTS_CTE = """
WITH latest_events AS (
  SELECT user_id, event_id, ts, event_type, value, props
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) AS __rn
    FROM events
  )
  WHERE __rn = 1
)
"""


# ---------------------------------------------------------------------------
# J5 flagship: config-driven enrichment chain (orders ⟕ customer ⟕ nation)
# ---------------------------------------------------------------------------

@query(
    "j5_enrichment_chain",
    oracle="""
    SELECT c.c_nationkey AS key,
           o.o_orderkey, o.o_totalprice, o.o_orderstatus,
           c.c_name    AS customer_name,
           c.c_acctbal AS customer_acctbal,
           n.n_name    AS nation_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey   = c.c_custkey
    LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
    """,
)
def j5_enrichment_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 J5/J2 + §2.2 P1/P2: the SchemaService.java:30-33 pipeline."""
    return compiler_for(spark, sf_dir).compile(ENRICHED_ORDERS)


# ---------------------------------------------------------------------------
# J1/J2 single-step stream-table joins, incl. P1 missing-field null-fill
# ---------------------------------------------------------------------------

_J2_MAPPINGS = (
    FieldMapping(MappingSide.LEFT, "o_orderkey", "o_orderkey"),
    FieldMapping(MappingSide.LEFT, "o_totalprice", "o_totalprice"),
    FieldMapping(MappingSide.RIGHT, "c_name", "customer_name"),
    FieldMapping(MappingSide.RIGHT, "c_mktsegment", "segment"),
    # P1 contract: configured field absent from the right schema → explicit
    # null column (DynamicPojoValueJoiner.java:59-63)
    FieldMapping(MappingSide.RIGHT, "no_such_field", "missing_field"),
)


def _single_join_pipeline(join_type: JoinType) -> PipelineDef:
    return PipelineDef(
        id=f"orders-customer-{join_type.value.lower()}",
        mode=ProcessingMode.JOIN_CHAIN,
        source=SourceDef(name="orders"),
        key_extraction=KeyExtraction(source=KeySource.VALUE, field_name="o_custkey"),
        join_operations=(
            JoinStep(
                right=SourceDef(name="customer"),
                join_type=join_type,
                broadcast=True,
                output_mappings=_J2_MAPPINGS,
            ),
        ),
    )


@query(
    "j2_stream_table_left_join",
    oracle="""
    SELECT o.o_custkey AS key, o.o_orderkey, o.o_totalprice,
           c.c_name AS customer_name, c.c_mktsegment AS segment,
           CAST(NULL AS VARCHAR) AS missing_field
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compiler_for(spark, sf_dir).compile(_single_join_pipeline(JoinType.LEFT_JOIN))


@query(
    "j1_stream_table_inner_join",
    oracle="""
    SELECT o.o_custkey AS key, o.o_orderkey, o.o_totalprice,
           c.c_name AS customer_name, c.c_mktsegment AS segment,
           CAST(NULL AS VARCHAR) AS missing_field
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compiler_for(spark, sf_dir).compile(_single_join_pipeline(JoinType.INNER_JOIN))


# ---------------------------------------------------------------------------
# J3/J4 table-table joins over the latest-per-key view (S2)
# ---------------------------------------------------------------------------

_TT_MAPPINGS = (
    FieldMapping(MappingSide.LEFT, "event_type", "event_type"),
    FieldMapping(MappingSide.LEFT, "value", "event_value"),
    FieldMapping(MappingSide.RIGHT, "c_name", "customer_name"),
    FieldMapping(MappingSide.RIGHT, "c_acctbal", "customer_acctbal"),
)


def _table_table_pipeline(join_type: JoinType) -> PipelineDef:
    return PipelineDef(
        id=f"latest-events-customer-{join_type.value.lower()}",
        mode=ProcessingMode.JOIN_CHAIN,
        source=SourceDef(name="events"),
        initial_source_is_stream=False,  # KTable-rooted chain (:125)
        join_operations=(
            JoinStep(
                right=SourceDef(name="customer"),
                join_type=join_type,
                broadcast=True,
                output_mappings=_TT_MAPPINGS,
            ),
        ),
    )


@query(
    "j4_table_table_left_join",
    oracle=LATEST_EVENTS_CTE
    + """
    SELECT e.user_id AS key, e.event_type, e.value AS event_value,
           c.c_name AS customer_name, c.c_acctbal AS customer_acctbal
    FROM latest_events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def j4_table_table_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compiler_for(spark, sf_dir).compile(_table_table_pipeline(JoinType.LEFT_JOIN))


@query(
    "j3_table_table_inner_join",
    oracle=LATEST_EVENTS_CTE
    + """
    SELECT e.user_id AS key, e.event_type, e.value AS event_value,
           c.c_name AS customer_name, c.c_acctbal AS customer_acctbal
    FROM latest_events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def j3_table_table_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compiler_for(spark, sf_dir).compile(_table_table_pipeline(JoinType.INNER_JOIN))


@query(
    "j_full_outer_join",
    oracle=LATEST_EVENTS_CTE
    + """
    SELECT COALESCE(e.user_id, c.c_custkey) AS key,
           e.event_type, e.value AS event_value,
           c.c_name AS customer_name, c.c_acctbal AS customer_acctbal
    FROM latest_events e FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL_OUTER_JOIN — the variant the reference's JoinType comment
    explicitly defers (AggregationDefinition.java:42-46 "Could add
    OUTER_JOIN later"). Unmatched right rows survive with null left
    fields (customers ≥ 150 have no events at sf0.01 — a left join would
    drop them, so the oracle distinguishes full-outer from left/inner);
    the running key coalesces across sides and is never null. Both-sided
    null handling is pinned by
    tests/test_compiler_semantics.py::test_full_outer_join_keeps_both_unmatched_sides."""
    return compiler_for(spark, sf_dir).compile(
        _table_table_pipeline(JoinType.FULL_OUTER_JOIN)
    )


# ---------------------------------------------------------------------------
# S2 latest-per-key view on its own
# ---------------------------------------------------------------------------

@query(
    "s2_latest_per_key",
    oracle=LATEST_EVENTS_CTE
    + """
    SELECT user_id, event_id, ts, event_type, value, props FROM latest_events
    """,
)
def s2_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = compiler_for(spark, sf_dir)
    df = comp.registry.table(SourceDef(name="events"))
    return df.select("user_id", "event_id", "ts", "event_type", "value", "props")


# ---------------------------------------------------------------------------
# A1 aggregations (count stub generalized per AggregationDefinition.java:38)
# ---------------------------------------------------------------------------

@query(
    "a1_count_by_key",
    oracle="SELECT o_custkey AS key, count(*) AS order_count FROM orders GROUP BY o_custkey",
)
def a1_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = PipelineDef(
        id="order-count",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="orders"),
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_custkey"),
        aggregations=(AggregationSpec(fn="count", alias="order_count"),),
    )
    return compiler_for(spark, sf_dir).compile(p)


@query(
    "a1_multi_agg",
    oracle="""
    SELECT o_orderstatus AS key,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def a1_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = PipelineDef(
        id="orders-by-status",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="orders"),
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="o_orderstatus"),
        aggregations=(
            AggregationSpec(fn="count", alias="n_orders"),
            AggregationSpec(
                fn="sum",
                source_field="CAST(o_totalprice AS DECIMAL(18,2))",
                alias="total_price",
                cast="double",
            ),
            AggregationSpec(fn="min", source_field="o_totalprice", alias="min_price"),
            AggregationSpec(fn="max", source_field="o_totalprice", alias="max_price"),
            AggregationSpec(fn="count_distinct", source_field="o_custkey", alias="n_customers"),
        ),
    )
    return compiler_for(spark, sf_dir).compile(p)


# ---------------------------------------------------------------------------
# P4 JSON parse (+ aggregation) over events.props
# ---------------------------------------------------------------------------

@query(
    "p4_json_parse_agg",
    oracle="""
    SELECT event_type AS key,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def p4_json_parse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (JsonStringToObjectMapper ≈ from_json/get_json_object) feeding A1."""
    p = PipelineDef(
        id="events-json-agg",
        mode=ProcessingMode.AGGREGATION,
        source=SourceDef(name="events"),
        group_by=KeyExtraction(source=KeySource.VALUE, field_name="event_type"),
        aggregations=(
            AggregationSpec(fn="count", alias="n_events"),
            AggregationSpec(
                fn="sum",
                source_field="CAST(get_json_object(props, '$.k') AS BIGINT)",
                alias="sum_k",
            ),
        ),
    )
    return compiler_for(spark, sf_dir).compile(p)


@query(
    "p4_json_schema_inference",
    oracle="""
    SELECT event_type AS key,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def p4_json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic-Map deserialization path (SerdeFactory.java:49-56): the
    ``props`` JSON column is parsed with NO declared schema — the engine
    infers a StructType from a bounded sample (sources.kafka.
    infer_json_schema) and parses with it, then aggregates the typed field.
    Same answer as p4_json_parse_agg, reached through schema inference."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.queries.registry import table
    from kafka_streams_common_spark.sources.kafka import parse_json_inferred

    events = table(spark, sf_dir, "events")
    parsed = parse_json_inferred(events, "props")
    return parsed.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("parsed.k").cast("bigint")).alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# SIMPLE_STREAM passthrough (P6 peek ≈ observe)
# ---------------------------------------------------------------------------

@query(
    "simple_stream_passthrough",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, user_id AS key
    FROM events
    """,
)
def simple_stream_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compiler_for(spark, sf_dir).compile(EVENTS_PASSTHROUGH)


# re-exported for __spark_entry__.entry()
FLAGSHIP = ENRICHED_ORDERS
_ = ORDER_COUNTS_BY_CUSTOMER  # referenced by tests/bench


@query(
    "s2_cdc_apply_tombstones",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS __rn
      FROM events
    )
    WHERE __rn = 1 AND event_type <> 'error'
    """,
)
def s2_cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 with DELETE semantics — the compacted-topic tombstone case the
    reference's KTable layer inherits from Kafka log compaction
    (``TopicProvisioner.java`` provisions compacted changelogs; a
    null-value record deletes the key) but never models: apply the
    changelog in (ts, event_id) order and DROP keys whose latest record
    is a tombstone ('error' plays the tombstone marker on the fixture).
    The naive spelling joins each key's latest timestamp back to the
    log; this one is a single ``max_by`` hash aggregation — one shuffle
    of (key, packed-struct) partials, no window sort, no self-join —
    then a histogram-sized filter on the winner's type.
    """
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.queries.registry import table

    events = table(spark, sf_dir, "events")
    winner = F.max_by(
        F.struct("event_id", "ts", "event_type", "value"),
        F.struct("ts", "event_id"),
    ).alias("s")
    return (
        events.groupBy("user_id")
        .agg(winner)
        .filter(F.col("s.event_type") != "error")
        .select(
            "user_id",
            F.col("s.event_id").alias("event_id"),
            F.col("s.ts").alias("ts"),
            F.col("s.event_type").alias("event_type"),
            F.col("s.value").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# S1 file-format legs through the external gate: the same catalog path
# reads csv and json — proven by round-tripping a fixture table through
# each format and re-reading it via TableCatalog/TableRef
# ---------------------------------------------------------------------------

def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_streams_common_spark.catalog import TableCatalog, TableRef
    from kafka_streams_common_spark.queries.registry import table

    src = table(spark, sf_dir, "nation")
    d = tempfile.mkdtemp(prefix=f"kscs_{fmt}_src_")
    atexit.register(shutil.rmtree, d, True)
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    getattr(w, fmt)(d)
    cat = TableCatalog(
        {
            "nation_rt": TableRef(
                name="nation_rt",
                path=d,
                format=fmt,
                schema=src.schema,
                key_field="n_nationkey",
            )
        }
    )
    return cat.resolve("nation_rt").read(spark).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "source_csv_roundtrip_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_csv_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's csv leg through the external gate: the nation table written
    as csv (headered) and re-read via
    the same TableCatalog/TableRef path every pipeline uses. The gate
    proves the format round-trip is value-exact, not just that the
    reader doesn't crash."""
    return _format_roundtrip(spark, sf_dir, "csv")


@query(
    "source_json_roundtrip_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_json_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's json-lines leg through the external gate — same round-trip
    contract as the csv row."""
    return _format_roundtrip(spark, sf_dir, "json")


@query(
    "source_orc_roundtrip_nation",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_orc_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1's ORC leg through the external gate (r14) — the second
    columnar warehouse format Spark reads natively. Same round-trip
    contract as the csv/json rows: nation written as ORC, re-read via
    the TableCatalog/TableRef path, value-exact against the parquet
    fixture. At 100 TB the format choice is a scan-efficiency decision
    (both are splittable, predicate-pushdown columnar formats); the
    catalog makes it a one-field swap rather than a pipeline rewrite."""
    return _format_roundtrip(spark, sf_dir, "orc")


@query(
    "sink_partitioned_overwrite_day",
    oracle="""
    SELECT event_id, user_id, event_type,
           CASE WHEN strftime(CAST(ts AS DATE), '%Y-%m-%d') = '2024-01-15'
                THEN value + 1000.0 ELSE value END AS value,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
    FROM events
    """,
)
def sink_partitioned_overwrite_day(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S4 generalized to the warehouse write shape: a DAY-partitioned
    parquet sink plus a DYNAMIC partition overwrite of one day — the
    idempotent-backfill operation every date-partitioned pipeline
    re-runs ("recompute 2024-01-15 and replace just that partition").
    Writes the full table partitioned by day, then overwrites ONLY the
    2024-01-15 partition with patched rows (value + 1000) using
    ``partitionOverwriteMode=dynamic``; reads the directory back and
    returns every row. The gate is exact: the read-back must equal the
    source with exactly that day patched — a STATIC-mode regression
    (which truncates the whole table on step 2) vanishes every other
    day and fails row counts; a hash-placement or dropped-partition bug
    flips values. Partition pruning on the re-read is the layout's
    point at 100 TB: one day's backfill touches one directory."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_streams_common_spark.queries.registry import table

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    )
    tmp = tempfile.mkdtemp(prefix="kscs_partsink_")
    atexit.register(shutil.rmtree, tmp, True)
    out = tmp + "/out"
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    patched = ev.filter(F.col("day") == "2024-01-15").withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    (
        patched.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.select(
        "event_id", "user_id", "event_type", "value",
        F.col("day").cast("string").alias("day"),
    )


@query(
    "source_schema_evolution_mergeread",
    oracle="""
    SELECT 'v1' AS batch, n_nationkey, n_name,
           CAST(NULL AS BIGINT) AS n_regionkey
    FROM nation
    UNION ALL
    SELECT 'v2' AS batch, n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def source_schema_evolution_mergeread(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S1's schema-evolution leg: an old batch written WITHOUT a column
    and a new batch written WITH it, read together under
    ``mergeSchema=true`` — the additive-column evolution every
    long-lived ingest directory accumulates. The gate is exact: the
    unified read must carry the superset schema with NULL backfill for
    the old batch (silently dropping the new column, failing the read,
    or misaligning columns by position all flip the hash). At 100 TB
    the same read works because parquet footer schemas merge per file —
    no rewrite of old data."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_streams_common_spark.queries.registry import table

    nation = table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="kscs_evolve_")
    atexit.register(shutil.rmtree, tmp, True)
    out = tmp + "/out"
    nation.select(
        F.lit("v1").alias("batch"), "n_nationkey", "n_name"
    ).write.mode("overwrite").parquet(out + "/batch=old")
    nation.select(
        F.lit("v2").alias("batch"), "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("overwrite").parquet(out + "/batch=new")
    back = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
    return back.select("batch", "n_nationkey", "n_name", "n_regionkey")


# ---------------------------------------------------------------------------
# MERGE INTO: the general upsert statement over the CDC split of the
# events changelog (operators/merge.py)
# ---------------------------------------------------------------------------

@query(
    "merge_upsert_user_state",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS __rn
      FROM events
    )
    WHERE __rn = 1
      AND NOT (ts >= TIMESTAMP '2024-01-20' AND event_type = 'error')
    """,
)
def merge_upsert_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta/Iceberg-style MERGE INTO over the changelog's CDC split:
    target = per-user state snapshot as of Jan 20 (latest-per-key,
    max_by hash-agg), source = the post-cutoff delta folded the same
    way; WHEN MATCHED UPDATE, WHEN MATCHED AND tombstone DELETE, WHEN
    NOT MATCHED INSERT ('error' plays the tombstone). The merged table
    must equal latest-per-key over the WHOLE log minus keys whose
    winner is a post-cutoff tombstone — the oracle replays exactly
    that, so the equivalence (snapshot ⊕ delta ≡ full-log fold) is the
    thing being gated, not just the plumbing.

    Scale posture (operators/merge.py): the snapshot side never
    shuffles post-fold — the delta broadcasts into a LEFT join for
    update/delete, and the insert anti-join sees only the snapshot's
    projected key column.
    """
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.merge import merge_into
    from kafka_streams_common_spark.queries.registry import table

    events = table(spark, sf_dir, "events")

    def fold(df: DataFrame) -> DataFrame:
        s = F.max_by(
            F.struct("event_id", "ts", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("s")
        return (
            df.groupBy("user_id")
            .agg(s)
            .select(
                "user_id",
                F.col("s.event_id").alias("event_id"),
                F.col("s.ts").alias("ts"),
                F.col("s.event_type").alias("event_type"),
                F.col("s.value").alias("value"),
            )
        )

    target = fold(events.filter(F.col("ts") < "2024-01-20"))
    delta = fold(events.filter(F.col("ts") >= "2024-01-20"))
    return merge_into(
        target,
        delta,
        "user_id",
        delete_condition=F.col("event_type") == "error",
    )


@query(
    "source_parquet_footer_walk",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS num_rows,
           CAST(3 AS INT) AS n_columns,
           CAST(1 AS INT) AS n_row_groups,
           'n_nationkey,n_name,n_regionkey' AS column_names,
           CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
           CAST(MAX(n_nationkey) AS BIGINT) AS max_key,
           CAST(COUNT(*) AS BIGINT) AS key_num_values,
           TRUE AS rowgroup_rows_match,
           MIN(n_name) AS min_name,
           MAX(n_name) AS max_name
    FROM nation
    """,
)
def source_parquet_footer_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet FOOTER walk with the repo's own Thrift compact reader
    (r14 wave 4) — the serde tier proven against a REAL third-party
    byte stream: nation is written by Spark's parquet-mr writer, the
    file bytes re-read through the ``binaryFile`` source, and the
    footer's Thrift-compact FileMetaData struct decoded by
    ``operators/thriftcompact.decode_struct`` (FileMetaData →
    SchemaElement / RowGroup → ColumnChunk → ColumnMetaData →
    Statistics, unknown fields skipped by type at every level). The
    oracle gates the recovered row count, leaf-column names, row-group
    count, the per-row-group/total row-count cross-check, AND the
    int32 and byte-array column STATISTICS (min/max decoded by the
    physical type the footer itself declares) against plain SQL
    aggregates of the same table — so a single wrong field-id delta,
    zigzag width, or nested-list walk anywhere in the thrift reader
    breaks the hash. At warehouse scale this is the planner's read:
    thousands of footers pruned without touching row data. Map-only
    after the one-file write."""
    import atexit
    import shutil
    import tempfile

    from kafka_streams_common_spark.operators.parquetmeta import (
        parquet_footer_stats,
        read_parquet_files,
    )
    from kafka_streams_common_spark.queries.registry import table

    src = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    d = tempfile.mkdtemp(prefix="kscs_pqfooter_")
    atexit.register(shutil.rmtree, d, True)
    src.coalesce(1).write.mode("overwrite").parquet(d)
    return parquet_footer_stats(
        read_parquet_files(spark, d), "n_nationkey", "n_name"
    )


@query(
    "source_orc_footer_walk",
    oracle="""
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS num_rows,
             CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
             CAST(MAX(n_nationkey) AS BIGINT) AS max_key,
             CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             MIN(n_name) AS min_name, MAX(n_name) AS max_name
      FROM nation
    )
    SELECT c.compression, a.num_rows, CAST(1 AS INT) AS n_stripes,
           a.num_rows AS stripe_rows,
           'n_nationkey,n_name,n_regionkey' AS field_names,
           a.min_key, a.max_key, a.key_sum, a.min_name, a.max_name
    FROM (VALUES ('zlib'), ('none')) c(compression) CROSS JOIN agg a
    """,
)
def source_orc_footer_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC tail walk with the repo's own PROTOBUF wire reader (r14
    wave 4) — the protobuf twin of `source_parquet_footer_walk`'s
    thrift synergy: nation is written by Spark's native ORC writer in
    BOTH the zlib and uncompressed forms, and the tail is parsed
    back-to-front from the public orc_proto spec — postscript (never
    compressed; its field-8000 "ORC" magic verified), the chunked
    compression framing undone ((length<<1)|isOriginal 3-byte words,
    raw-DEFLATE bodies, output-capped), then the footer message:
    repeated StripeInformation (row counts cross-checked against the
    footer total), the TYPE TREE (root-struct field names + subtypes,
    arity enforced), and per-column statistics with zigzag sint64
    min/max/SUM and string min/max — all gated against SQL aggregates
    of the same table. The repeated-field walk exercises BOTH proto
    layouts (packed runs for the uint32 lists, unpacked for strings
    and messages). The planner's read at warehouse scale: footers
    only, file-parallel, row data untouched. Map-only after the two
    one-file writes."""
    import atexit
    import shutil
    import tempfile

    from kafka_streams_common_spark.operators.orcmeta import (
        orc_footer_stats,
        read_orc_files,
    )
    from kafka_streams_common_spark.queries.registry import table

    src = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    outs = []
    for comp in ("zlib", "none"):
        d = tempfile.mkdtemp(prefix=f"kscs_orcfooter_{comp}_")
        atexit.register(shutil.rmtree, d, True)
        src.coalesce(1).write.mode("overwrite").option("compression", comp).orc(d)
        outs.append(read_orc_files(spark, d))
    return orc_footer_stats(outs[0].unionByName(outs[1]), "n_nationkey", "n_name")
