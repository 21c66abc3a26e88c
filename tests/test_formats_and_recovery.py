"""File-format scans beyond parquet + streaming checkpoint recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_streams_common_spark.catalog import TableCatalog, TableRef
from kafka_streams_common_spark.streaming import StreamingCompiler
from kafka_streams_common_spark.streaming.runner import run_changelog_materialization
from kafka_streams_common_spark.registry import latest_per_key
from tests.conftest import SF_SMOKE


def test_csv_and_json_sources_through_catalog(spark, tmp_path):
    """S1's file-format row: the same catalog/compiler path works over
    csv and json sources, not just parquet."""
    src = TableCatalog.for_directory(SF_SMOKE).resolve("nation").read(spark)
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    src.write.option("header", "true").csv(csv_path)
    src.write.json(json_path)

    cat = TableCatalog(
        {
            "nation_csv": TableRef(
                name="nation_csv",
                path=csv_path,
                format="csv",
                schema=src.schema,
                key_field="n_nationkey",
            ),
            "nation_json": TableRef(
                name="nation_json",
                path=json_path,
                format="json",
                schema=src.schema,
                key_field="n_nationkey",
            ),
        }
    )
    base = {r["n_nationkey"]: r["n_name"] for r in src.collect()}
    for name in ("nation_csv", "nation_json"):
        got = {
            r["n_nationkey"]: r["n_name"] for r in cat.resolve(name).read(spark).collect()
        }
        assert got == base, name


def test_orc_source_through_catalog(spark, tmp_path):
    """S1's ORC leg (r14): write nation as ORC, re-read through the same
    TableCatalog/TableRef path, value-exact — all columns, not just the
    key/name pair."""
    src = TableCatalog.for_directory(SF_SMOKE).resolve("nation").read(spark)
    orc_path = str(tmp_path / "nation_orc")
    src.write.orc(orc_path)
    cat = TableCatalog(
        {
            "nation_orc": TableRef(
                name="nation_orc",
                path=orc_path,
                format="orc",
                schema=src.schema,
                key_field="n_nationkey",
            )
        }
    )
    cols = src.columns
    base = sorted(tuple(r[c] for c in cols) for r in src.collect())
    got = sorted(
        tuple(r[c] for c in cols)
        for r in cat.resolve("nation_orc").read(spark).collect()
    )
    assert got == base


def test_changelog_materialization_resumes_from_checkpoint(spark, tmp_path):
    """Fault tolerance (SURVEY §2.7 exactly-once row): the stateful merge
    resumes from its checkpoint — new files after a restart are folded into
    the prior state; already-processed files are not reprocessed."""
    events = TableCatalog.for_directory(SF_SMOKE).resolve("events").read(spark)
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    stream_dir = str(tmp_path / "in")
    first.repartition(2).write.mode("overwrite").parquet(stream_dir)

    cat = TableCatalog(
        {"events": TableRef(name="events", path=stream_dir, key_field="user_id")}
    )
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        comp = StreamingCompiler(spark, cat, max_files_per_trigger=1)
        return run_changelog_materialization(
            comp.stream_source("events"),
            spark,
            state_dir,
            key_field="user_id",
            seq_field="ts",
            tiebreak_field="event_id",
            checkpoint_dir=ckpt,
        )

    state1 = run_once()
    expect1 = latest_per_key(first, "user_id", "ts", "event_id")
    assert state1.count() == expect1.count()

    # "restart": add the second half, run again with the SAME checkpoint
    for i, pdf in enumerate([second]):
        pdf.repartition(2).write.mode("append").parquet(stream_dir)
    state2 = run_once()
    expect2 = latest_per_key(events, "user_id", "ts", "event_id")
    got = {(r["user_id"], r["event_id"]) for r in state2.collect()}
    want = {(r["user_id"], r["event_id"]) for r in expect2.collect()}
    assert got == want
    # checkpoint recorded progress across both runs
    assert os.path.isdir(ckpt) and os.listdir(ckpt)


def test_corpus_shard_writer(spark, tmp_path):
    """Range-sharded parquet output: row budget respected per file, global
    range ordering across shards, round-trip identical."""
    import glob

    import pyarrow.parquet as pq

    from kafka_streams_common_spark.queries.registry import table
    from kafka_streams_common_spark.sinks import write_corpus_shards
    from tests.conftest import SF_ORACLE

    docs = table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    n = docs.count()
    out = str(tmp_path / "shards")
    write_corpus_shards(docs, out, "doc_id", num_shards=4, max_records_per_file=50)

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= n // 50  # row budget forces enough files
    shard_ranges: dict[int, list[int]] = {}
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        rows = t.num_rows
        assert rows <= 50
        total += rows
        ids = t.column("doc_id").to_pylist()
        # files group per output shard: part-<shard>-<uuid>...
        shard = int(os.path.basename(f).split("-")[1])
        rng = shard_ranges.setdefault(shard, [min(ids), max(ids)])
        rng[0] = min(rng[0], min(ids))
        rng[1] = max(rng[1], max(ids))
    assert total == n
    assert len(shard_ranges) == 4
    # range partitioning ⇒ shard key ranges are globally ordered and
    # non-overlapping: shard k's max < shard k+1's min
    ordered = [shard_ranges[s] for s in sorted(shard_ranges)]
    for (_, hi), (lo, _) in zip(ordered, ordered[1:]):
        assert hi < lo, ordered
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.exceptAll(docs).count() == 0 and docs.exceptAll(back).count() == 0


def test_schema_evolution_merge_and_missing_column_null_fill(spark, tmp_path):
    """Schema evolution across parquet batches (the S6/SchemaService
    seam a long-lived pipeline hits): a later ingest batch adds a
    column; mergeSchema reads expose the union schema with NULL-filled
    history, and the P1 null-fill projection contract applies to the
    evolved column exactly like a missing config field."""
    import os

    from pyspark.sql import functions as F

    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    ).write.parquet(os.path.join(d, "batch=0"))
    spark.createDataFrame(
        [(3, "c", 30.0)], "id bigint, v string, score double"
    ).write.parquet(os.path.join(d, "batch=1"))

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) >= {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 30.0}
    # evolved column participates in aggregation with null-safe semantics
    agg = merged.agg(
        F.count("score").alias("n"), F.sum("score").alias("s")
    ).collect()[0]
    assert (agg["n"], agg["s"]) == (1, 30.0)
