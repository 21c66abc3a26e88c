"""As-of join edge semantics (operators.asof)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

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


def test_asof_null_right_value_attribution_and_tolerance(spark):
    """A right row whose CARRIED column is genuinely NULL must still be
    the matched row: the value stays NULL (not resurrected from an older
    right row) and tolerance gates on THAT row's timestamp. Locks the
    whole-row struct-carry semantics (per-column last(ignorenulls) would
    mix rows)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "probe")], ["k", "t", "label"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T05:00:00"), "old"),
            (1, _ts("2024-01-01T09:59:00"), None),  # matched row, NULL v
        ],
        "k bigint, t timestamp, v string",
    )
    # no tolerance: the matched (newest ≤ left) row wins — NULL v, not "old"
    rows = asof_join(
        left, right, on="k", left_time="t", right_time="t", right_cols=["v"]
    ).collect()
    assert rows[0]["v"] is None
    # tolerance measured against the MATCHED row's time (1 min gap): the
    # match is inside a 5-min tolerance even though the older non-null
    # row is not — result is still the matched row's NULL value
    rows = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        right_cols=["v"],
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    ).collect()
    assert rows[0]["v"] is None
