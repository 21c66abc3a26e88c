"""MERGE INTO semantics (operators/merge.py) and bucketed-layout
operator plumbing (operators/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.merge import merge_into
from tests.conftest import SF_SMOKE


def _fixture(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, w int"
    )
    source = spark.createDataFrame(
        [(2, "B", "u"), (3, "c2", "d"), (4, "D", "u"), (5, "E", "d")],
        "k int, v string, op string",
    )
    return target, source


def test_merge_update_delete_insert_clauses(spark):
    target, source = _fixture(spark)
    got = {
        r["k"]: (r["v"], r["w"])
        for r in merge_into(
            target,
            source,
            "k",
            update_cols=["v"],
            delete_condition=F.col("op") == "d",
        ).collect()
    }
    assert got == {
        1: ("a", 10),  # unmatched target: untouched
        2: ("B", 20),  # matched update: v from source, w preserved
        # 3 deleted (matched + tombstone)
        4: ("D", None),  # insert: w absent from source -> NULL
        # 5 suppressed (tombstone for an absent key is a no-op)
    }


def test_merge_without_insert_keeps_target_keyset_minus_deletes(spark):
    target, source = _fixture(spark)
    got = merge_into(
        target,
        source,
        "k",
        update_cols=["v"],
        delete_condition=F.col("op") == "d",
        insert=False,
    )
    assert sorted(r["k"] for r in got.collect()) == [1, 2]


def test_merge_default_update_cols_are_shared_non_key(spark):
    target, source = _fixture(spark)
    # default update set = {v} (w is target-only, op is source-only)
    got = {r["k"]: (r["v"], r["w"]) for r in merge_into(target, source, "k").collect()}
    assert got[2] == ("B", 20)
    assert got[3] == ("c2", 30)  # no delete clause: 3 is a plain update
    assert got[5] == ("E", None)  # no delete clause: 5 inserts


def test_merge_null_delete_condition_counts_false(spark):
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    source = spark.createDataFrame([(1, "A", None)], "k int, v string, op string")
    got = merge_into(
        target, source, "k", delete_condition=F.col("op") == "d"
    ).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "A")]


def test_merge_dedup_source_by_folds_duplicate_keys(spark):
    """A duplicated source key must NOT fan out when dedup_source_by is
    given: the row with the greatest ordering tuple wins on every leg —
    update, delete, and insert."""
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    )
    source = spark.createDataFrame(
        [
            (1, "A1", 1, "u"),  # superseded
            (1, "A2", 2, "u"),  # wins for k=1 -> update to A2
            (2, "B1", 2, "d"),  # wins for k=2 -> delete
            (2, "B2", 1, "u"),  # superseded
            (4, "D1", 1, "u"),  # superseded
            (4, "D2", 3, "u"),  # wins for k=4 -> single insert
        ],
        "k int, v string, seq int, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_into(
            target,
            source,
            "k",
            delete_condition=F.col("op") == "d",
            dedup_source_by=["seq"],
        ).collect()
    }
    assert got == {1: "A2", 4: "D2"}
    # and the same feed WITHOUT the fold fans out (the documented
    # precondition violation — 2 rows for k=1, duplicate inserts for 4)
    fanned = merge_into(
        target, source, "k", delete_condition=F.col("op") == "d"
    ).collect()
    assert len([r for r in fanned if r["k"] == 4]) == 2
    with pytest.raises(ValueError):
        merge_into(target, source, "k", dedup_source_by=["nope"])


def test_merge_rejects_bad_update_cols_and_missing_key(spark):
    target, source = _fixture(spark)
    with pytest.raises(ValueError, match="absent from source"):
        merge_into(target, source, "k", update_cols=["w"])
    with pytest.raises(ValueError, match="must exist on both sides"):
        merge_into(target, source.drop("k"), "k")


def test_merge_broadcasts_delta_so_snapshot_never_shuffles(spark):
    """The 100 TB contract: the update/delete leg is a BroadcastHashJoin
    (delta built, snapshot exchange-free), and the insert anti-join's
    target side carries ONLY the projected key column into its
    exchange — never the snapshot's payload."""
    target, source = _fixture(spark)
    df = merge_into(
        target, source, "k", delete_condition=F.col("op") == "d"
    )
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter, BuildRight" in plan, plan
    assert "LeftAnti" in plan, plan
    # the anti leg's target side is a single-column key projection
    assert re.search(r"Project \[k#\d+\]", plan), plan


def test_bucketed_join_operator_plan_and_parity(spark):
    """The operator-path twin of the inline bucketing test: bucketed
    scans satisfy the SMJ distribution (zero Exchange in the join
    subtree) and the layout is invisible to results."""
    from kafka_streams_common_spark.queries.standard import (
        _bucketed_orders_lineitem_join,
    )
    from kafka_streams_common_spark.queries.registry import table

    j = _bucketed_orders_lineitem_join(spark, SF_SMOKE)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    expected = (
        table(spark, SF_SMOKE, "orders")
        .join(
            table(spark, SF_SMOKE, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert j.count() == expected
