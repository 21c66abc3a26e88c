"""Data-governance tier tests: profiling, constraints, salted join, chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.profile import (
    check_constraints,
    profile_columns,
)
from kafka_streams_common_spark.operators.skewjoin import salted_join
from kafka_streams_common_spark.operators.text import chunk_documents


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (3, None, 30.0),
        (4, "b", 40.0),
    ]
    return spark.createDataFrame(rows, ["id", "s", "v"])


def test_profile_metrics(mixed_df):
    out = {r["column"]: r for r in profile_columns(mixed_df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["completeness"] == pytest.approx(0.75)
    assert out["s"]["mean_value"] is None  # non-numeric
    assert out["v"]["mean_value"] == pytest.approx((10 + 30 + 40) / 3)
    assert out["v"]["min_value"] == "10.0" and out["v"]["max_value"] == "40.0"
    assert out["id"]["n_distinct"] == 4


def test_profile_approx_mode_and_errors(mixed_df):
    out = {r["column"]: r for r in profile_columns(mixed_df, ["id"], approx=True).collect()}
    # HLL on 4 distinct small ints is exact in practice; allow slack anyway
    assert abs(out["id"]["n_distinct"] - 4) <= 1
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(mixed_df, ["nope"])


def test_profile_single_scan_plan(mixed_df):
    """The whole profile is ONE aggregation over the input — the plan
    must contain no join/union of per-column subqueries (the naive
    profiler shape) and exactly one scan of the source."""
    plan = profile_columns(mixed_df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


def test_constraints_pass_fail(mixed_df):
    checks = [
        ("id_unique", F.countDistinct("id"), F.countDistinct("id") == F.count(F.lit(1))),
        ("v_complete", F.count("v"), F.count("v") == F.count(F.lit(1))),
    ]
    out = {r["constraint_name"]: r for r in check_constraints(mixed_df, checks).collect()}
    assert out["id_unique"]["passed"] is True and out["id_unique"]["observed"] == 4.0
    assert out["v_complete"]["passed"] is False and out["v_complete"]["observed"] == 3.0
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(mixed_df, [checks[0], checks[0]])
    with pytest.raises(ValueError, match="no constraints"):
        check_constraints(mixed_df, [])


@pytest.fixture(scope="module")
def skew_facts(spark):
    # key 1 is hot (80 rows), keys 2..5 cold; key 99 misses the dim
    rows = [(i, 1 if i < 80 else (i % 5) + 2 if i < 95 else 99) for i in range(100)]
    return spark.createDataFrame(rows, ["fact_id", "k"])


@pytest.fixture(scope="module")
def skew_dim(spark):
    return spark.createDataFrame([(k, f"dim_{k}") for k in range(1, 7)], ["k", "attr"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_unsalted(skew_facts, skew_dim):
    for how in ("inner", "left"):
        plain = skew_facts.join(skew_dim, "k", how)
        salted = salted_join(skew_facts, skew_dim, "k", "fact_id", 8, how)
        assert _rows(salted.select("k", "fact_id", "attr")) == _rows(
            plain.select("k", "fact_id", "attr")
        )
        assert "__salt" not in salted.columns


def test_salted_join_spreads_hot_key(skew_facts, skew_dim):
    """The hot key's fact rows must land in >1 salt bucket — otherwise
    the salt isn't doing its job of splitting the hot reducer."""
    salted = skew_facts.withColumn("salt", F.pmod(F.hash("fact_id"), F.lit(8)))
    n_buckets = salted.filter("k = 1").select("salt").distinct().count()
    assert n_buckets > 1


def test_salted_join_validation(skew_facts, skew_dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skew_facts, skew_dim, "k", "fact_id", 8, "full")
    with pytest.raises(ValueError, match="salt_buckets"):
        salted_join(skew_facts, skew_dim, "k", "fact_id", 0)


@pytest.fixture(scope="module")
def chunk_docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(10))),   # short: 1 chunk
        (1, " ".join(f"w{i}" for i in range(64))),   # exactly chunk_size
        (2, " ".join(f"x{i}" for i in range(65))),   # one token over
        (3, " ".join(f"y{i}" for i in range(200))),  # many chunks
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_counts_and_coverage(chunk_docs):
    out = chunk_documents(chunk_docs, chunk_size=64, stride=48)
    per_doc = {
        r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # 1 + max(0, ceil((n-64)/48)): 10→1, 64→1, 65→2, 200→1+ceil(136/48)=4
    assert per_doc == {0: 1, 1: 1, 2: 2, 3: 4}
    # every token of doc 3 appears in at least one chunk, in order
    toks = set()
    for r in out.filter("doc_id = 3").collect():
        toks.update(r["chunk_text"].split(" "))
    assert toks == {f"y{i}" for i in range(200)}
    # overlap: consecutive chunks share chunk_size - stride tokens
    c0, c1 = [
        r["chunk_text"].split(" ")
        for r in out.filter("doc_id = 3").orderBy("chunk_id").collect()[:2]
    ]
    assert c0[48:] == c1[:16]


def test_chunk_short_tail_not_dropped(chunk_docs):
    last = (
        chunk_documents(chunk_docs, chunk_size=64, stride=48)
        .filter("doc_id = 3")
        .orderBy(F.desc("chunk_id"))
        .first()
    )
    # 200 tokens: last chunk starts at 3*48=144, holds 56 tokens
    assert last["n_chunk_tokens"] == 56
    assert last["chunk_text"].split(" ")[-1] == "y199"


def test_chunk_validation(chunk_docs):
    with pytest.raises(ValueError, match="stride > chunk_size"):
        chunk_documents(chunk_docs, chunk_size=8, stride=9)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(chunk_docs, chunk_size=0)


def test_chunk_plan_no_shuffle(chunk_docs):
    plan = (
        chunk_documents(chunk_docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only: tokenize, explode, slice


def test_profile_and_chunk_empty_edge_cases(spark):
    """Degenerate inputs must not throw: an empty frame profiles to
    zero-count rows (null min/max/mean, null completeness from 0/0);
    an empty-string document still yields exactly one (empty) chunk."""
    from kafka_streams_common_spark.operators.profile import profile_columns
    from kafka_streams_common_spark.operators.text import chunk_documents

    empty = spark.createDataFrame([], "id bigint, v double")
    out = {r["column"]: r for r in profile_columns(empty).collect()}
    assert out["v"]["n_rows"] == 0 and out["v"]["n_nulls"] == 0
    assert out["v"]["n_distinct"] == 0
    assert out["v"]["min_value"] is None and out["v"]["mean_value"] is None

    one_empty_doc = spark.createDataFrame([(0, "")], ["doc_id", "text"])
    chunks = chunk_documents(one_empty_doc).collect()
    assert len(chunks) == 1 and chunks[0]["chunk_text"] == ""
    assert chunks[0]["n_chunk_tokens"] == 1  # split('') -> [''] convention


def test_psi_drift_detects_shift_and_handles_degenerate_inputs(spark):
    """PSI must read ~0 for identically-distributed halves, read large
    for a shifted batch, and stay finite on empty/constant inputs
    (add-one smoothing)."""
    from kafka_streams_common_spark.operators.profile import profile_drift_psi

    base = spark.range(0, 2000).selectExpr("cast(id % 100 as double) as x")
    same = spark.range(2000, 4000).selectExpr("cast(id % 100 as double) as x")
    shifted = spark.range(0, 2000).selectExpr(
        "cast(id % 100 + 80 as double) as x"
    )

    def psi(a, b):
        rows = profile_drift_psi(a, b, "x", n_buckets=10).collect()
        assert len(rows) == 10
        return sum(r["psi_term"] for r in rows)

    assert abs(psi(base, same)) < 0.01
    assert psi(base, shifted) > 0.25  # the standard "action" threshold
    # degenerate: one side empty -> finite PSI, no division error
    empty = base.filter("x < 0")
    assert psi(base, empty) == psi(base, empty)  # not NaN
    # degenerate: constant column -> single bucket; equal-size batches
    # give bit-zero drift (with unequal sizes the add-one smoothing
    # contributes a small size-dependent term, by design)
    const_a = spark.range(10).selectExpr("cast(5 as double) as x")
    const_b = spark.range(10, 20).selectExpr("cast(5 as double) as x")
    assert abs(psi(const_a, const_b)) < 1e-9


def test_snapshot_diff_null_transitions_and_no_change(spark):
    """snapshot_diff must register NULL→value and value→NULL as updates
    (NULL-safe digest), classify inserts/deletes, and emit NOTHING for
    identical snapshots."""
    from kafka_streams_common_spark.operators.rollup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "now-set"), (3, None), (5, "e")], "k bigint, v string"
    )
    got = {
        (r["k"], r["change_type"]) for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        (2, "update"),  # NULL -> value
        (3, "update"),  # value -> NULL
        (4, "delete"),
        (5, "insert"),
    }
    assert snapshot_diff(old, old, ["k"]).count() == 0
