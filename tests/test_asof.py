"""As-of join edge semantics (operators.asof)."""

from __future__ import annotations

from datetime import datetime

from kafka_streams_common_spark.operators.asof import asof_join


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_inclusive_equality_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "exact"),   # == right t → matches it
            (1, _ts("2024-01-01T04:00:00"), "early"),   # before all rights → null
            (1, _ts("2024-01-01T12:00:00"), "later"),   # after both → latest right
            (2, _ts("2024-01-01T12:00:00"), "other"),   # key with no rights → null
        ],
        ["k", "t", "label"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T05:00:00"), "r5"),
            (1, _ts("2024-01-01T10:00:00"), "r10"),
        ],
        ["k", "t", "v"],
    )
    out = {
        r["label"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t", right_cols=["v"]
        ).collect()
    }
    assert out == {"exact": "r10", "early": None, "later": "r10", "other": None}


def test_asof_right_dedup_deterministic(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), "x")], ["k", "t", "label"])
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T10:00:00"), "z"),  # same key+time: max wins
        ],
        ["k", "t", "v"],
    )
    rows = asof_join(
        left, right, on="k", left_time="t", right_time="t", right_cols=["v"]
    ).collect()
    assert rows[0]["v"] == "z"
