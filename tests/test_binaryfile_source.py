"""Production-scale file ingest (r14): the WARC and Avro-OCF decode
kernels driven by Spark's ``binaryFile`` source over REAL files on
disk — proving the fixture path's kernels are the same code a 100 TB
one-shard-per-file lake would run (id recovered from the filename,
file-parallel scan, no shuffle)."""

from __future__ import annotations

import hashlib

from kafka_streams_common_spark.operators import avro as av
from kafka_streams_common_spark.operators import warc as w


def _docs_df(spark, n=9):
    rows = [(i, f"file doc {i} " + "z" * (i * 29 % 200), "en") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_warc_binaryfile_roundtrip(spark, tmp_path):
    docs = _docs_df(spark)
    for r in w.encode_warc_shards(docs, n_shards=3).collect():
        (tmp_path / f"shard-{r['shard_id']}.warc.gz").write_bytes(r["payload"])

    out = {r["doc_id"]: r for r in
           w.read_warc_shard_files(spark, str(tmp_path)).collect()}
    assert len(out) == 9
    for i in range(9):
        body = f"file doc {i} " + "z" * (i * 29 % 200)
        assert out[i]["payload_md5"] == hashlib.md5(body.encode()).hexdigest()
        assert out[i]["shard_id"] == i % 3
    # the plan is a file scan + one Arrow kernel — no exchange anywhere
    plan = w.read_warc_shard_files(spark, str(tmp_path))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_ocf_binaryfile_roundtrip(spark, tmp_path):
    orders = spark.createDataFrame(
        [(k, 10 + k, float(k) * 2.5, "F", f"P{k}") for k in range(1, 31)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string",
    )
    for r in av.encode_orders_ocf(orders, n_containers=5).collect():
        (tmp_path / f"orders-{r['container_id']}.avro").write_bytes(r["payload"])

    out = {r["o_orderkey"]: r for r in
           av.read_ocf_files(spark, str(tmp_path)).collect()}
    assert len(out) == 30
    assert out[14]["priority"] is None  # 14 % 7 == 0 -> null union branch
    assert out[12]["container_id"] == 2 and out[12]["codec"] == "deflate"
    plan = av.read_ocf_files(spark, str(tmp_path))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
