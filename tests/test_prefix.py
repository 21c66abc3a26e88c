"""Distributed global prefix aggregation vs the single-partition truth.

``operators/prefix.py`` must be BIT-IDENTICAL to the
``Window.orderBy(...)`` (no partitionBy) plan it replaces — rank,
running sums, and the derived ntile — across bucket counts, ties, and
degenerate inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.prefix import (
    global_prefix,
    ntile_from_rank,
)


def _fixture(spark):
    # values with heavy ties (v repeats), negative values, and a
    # unique tiebreaker id
    rows = [(i, (i * 7) % 13 - 6, (i * 3) % 5) for i in range(997)]
    return spark.createDataFrame(rows, "id long, v long, w long")


@pytest.mark.parametrize("n_buckets", [1, 4, 32, 2000])
def test_rank_matches_global_window(spark, n_buckets):
    df = _fixture(spark)
    got = global_prefix(
        df, ["v", "id"], rank_col="rnk", n_buckets=n_buckets
    )
    want = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("rnk")
    )
    diff = (
        got.select("id", "rnk")
        .exceptAll(want)
        .unionAll(want.exceptAll(got.select("id", "rnk")))
    )
    assert diff.count() == 0


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_running_sums_match_global_window(spark, n_buckets):
    df = _fixture(spark).groupBy("v").agg(
        F.sum("w").alias("sw"), F.count(F.lit(1)).alias("cnt")
    )  # distinct order key, like the KS histogram
    got = global_prefix(
        df, ["v"], sum_cols=["sw", "cnt"], n_buckets=n_buckets
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "v",
        F.sum("sw").over(w).alias("run_sw"),
        F.sum("cnt").over(w).alias("run_cnt"),
    )
    got_pd = got.select("v", "run_sw", "run_cnt").orderBy("v").toPandas()
    want_pd = want.orderBy("v").toPandas()
    assert got_pd.equals(want_pd)


def test_ntile_from_rank_matches_sql_ntile(spark):
    df = _fixture(spark)
    for k in (3, 10, 997, 1500):  # includes n % k != 0 and k > n
        ranked = global_prefix(df, ["v", "id"], rank_col="rnk", n_buckets=8)
        total = df.groupBy().agg(F.count(F.lit(1)).alias("n"))
        got = ranked.crossJoin(F.broadcast(total)).select(
            "id", ntile_from_rank(F.col("rnk"), F.col("n"), k).alias("b")
        )
        want = df.select(
            "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("b")
        )
        diff = (
            got.exceptAll(want).unionAll(want.exceptAll(got))
        )
        assert diff.count() == 0, f"k={k}"


def test_all_null_and_empty_inputs(spark):
    empty = spark.createDataFrame([], "id long, v long")
    out = global_prefix(empty, ["v", "id"], rank_col="rnk", sum_cols=["v"])
    assert out.count() == 0
    assert set(out.columns) == {"id", "v", "rnk", "run_v"}
    # ALL order keys NULL: every row lands in the dedicated NULL bucket,
    # ranks are the plain id-ordered sequence (ASC NULLS FIRST semantics)
    all_null = spark.createDataFrame(
        [(i, None) for i in range(25)], "id long, v double"
    )
    got = global_prefix(all_null, ["v", "id"], rank_col="rnk", n_buckets=8)
    want = all_null.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("rnk")
    )
    diff = (
        got.select("id", "rnk")
        .exceptAll(want)
        .unionAll(want.exceptAll(got.select("id", "rnk")))
    )
    assert diff.count() == 0


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_mixed_null_keys_match_global_window(spark, n_buckets):
    """r10 hardening pin: NULL order keys rank FIRST (Spark ASC NULLS
    FIRST) via the dedicated first bucket, and the non-NULL buckets'
    offsets stay exact — rank AND running sums bit-identical to the
    single-partition Window reference."""
    rows = [
        (i, None if i % 7 == 0 else float((i * 11) % 19 - 9), (i * 3) % 5)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, v double, w long")
    got = global_prefix(
        df, ["v", "id"], sum_cols=["w"], rank_col="rnk", n_buckets=n_buckets
    )
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "id",
        F.row_number().over(Window.orderBy("v", "id")).alias("rnk"),
        F.sum("w").over(w).alias("run_w"),
    )
    got_sel = got.select("id", "rnk", "run_w")
    diff = got_sel.exceptAll(want).unionAll(want.exceptAll(got_sel))
    assert diff.count() == 0


def test_date_and_timestamp_order_keys(spark):
    """r10 hardening pin: date/timestamp order keys go through the
    monotone double surrogate and match the Window reference exactly."""
    import datetime as dt

    rows = [
        (
            i,
            dt.date(2024, 1, 1) + dt.timedelta(days=(i * 5) % 37),
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=(i * 13) % 101),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, d date, ts timestamp")
    for col in ("d", "ts"):
        got = global_prefix(df, [col, "id"], rank_col="rnk", n_buckets=8)
        want = df.select(
            "id", F.row_number().over(Window.orderBy(col, "id")).alias("rnk")
        )
        diff = (
            got.select("id", "rnk")
            .exceptAll(want)
            .unionAll(want.exceptAll(got.select("id", "rnk")))
        )
        assert diff.count() == 0, col


def test_string_order_key_raises(spark):
    """r10 hardening pin: a string order column must raise TypeError
    instead of silently bucketing in an order inconsistent with the
    native lexicographic sort ('2' would outrank '12')."""
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(24)], "id long, v string"
    )
    with pytest.raises(TypeError, match="order column"):
        global_prefix(df, ["v", "id"], rank_col="rnk", n_buckets=4)


def test_requires_something_to_compute(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError):
        global_prefix(df, ["v"])


def test_no_global_sort_in_plan(spark):
    """The replacement's whole point: no data-sized single-partition
    WindowExec. Every Window in the physical plan must carry a
    partitionBy (the __bucket column)."""
    df = _fixture(spark)
    plan = (
        global_prefix(df, ["v", "id"], rank_col="rnk", n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__bucket" in line, line


def test_token_budget_shards_contiguous_and_exact(spark):
    """token_budget_shards (the order-preserving consumer): shard ids
    are floor(start_offset / budget) against an exact sequential
    reference; shards form contiguous, ordered id ranges."""
    from kafka_streams_common_spark.operators.text import (
        token_budget_shards,
    )

    rows = [(i, " ".join(["w"] * ((i * 13) % 17 + 1))) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in token_budget_shards(docs, 50).collect()
    }
    off = 0
    prev_shard = 0
    for i, text in rows:  # doc_id order
        n = len(text.split(" "))
        want_shard = off // 50
        assert got[i] == (n, want_shard), i
        assert want_shard >= prev_shard  # order-preserving contiguity
        prev_shard = want_shard
        off += n


def test_token_budget_shards_empty_and_single_doc(spark):
    from kafka_streams_common_spark.operators.text import (
        token_budget_shards,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert token_budget_shards(empty, 100).count() == 0
    one = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    row = token_budget_shards(one, 100).collect()[0]
    assert (row["doc_id"], row["n_tokens"], row["shard"]) == (7, 3, 0)
    # a single document larger than the budget still lands in the shard
    # of its start offset (shard 0) — oversized docs never split
    big = spark.createDataFrame(
        [(1, " ".join(["w"] * 250)), (2, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["shard"] for r in token_budget_shards(big, 100).collect()}
    assert got == {1: 0, 2: 2}  # doc 2 starts at offset 250 -> shard 2
