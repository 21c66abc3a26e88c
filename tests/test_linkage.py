"""Record-linkage blocking modes (operators/linkage.py).

The planted single-token-typo witness: token blocking loses a
single-token name whose one blocking key the typo breaks; n-gram
blocking recovers it (a single edit destroys at most ngram_size grams).
"""

from __future__ import annotations

import pytest

from kafka_streams_common_spark.operators.linkage import (
    fuzzy_match_to_reference,
)


def _tables(spark):
    dirty = spark.createDataFrame(
        [
            (1, "zurch"),          # single-token typo of "zurich"
            (2, "geneva basle"),   # multi-token typo of "geneva basel"
            (3, "qqqqq"),          # matches nothing
        ],
        "id int, name string",
    )
    ref = spark.createDataFrame(
        [("zurich",), ("geneva basel",), ("bern",)], "ref string"
    )
    return dirty, ref


def test_token_blocking_loses_single_token_typo(spark):
    dirty, ref = _tables(spark)
    got = {
        r["id"]: r["matched_name"]
        for r in fuzzy_match_to_reference(
            dirty, ref, "name", "ref", "id", max_distance=2
        ).collect()
    }
    # the multi-token name still shares the unbroken "geneva" token;
    # the single-token typo shares NO token — the documented gap
    assert got == {1: None, 2: "geneva basel", 3: None}


def test_ngram_blocking_recovers_single_token_typo(spark):
    dirty, ref = _tables(spark)
    out = {
        r["id"]: (r["matched_name"], r["distance"])
        for r in fuzzy_match_to_reference(
            dirty,
            ref,
            "name",
            "ref",
            "id",
            max_distance=2,
            blocking="ngram",
            ngram_size=3,
        ).collect()
    }
    assert out == {
        1: ("zurich", 1),
        2: ("geneva basel", 2),  # transposition = 2 Levenshtein edits
        3: (None, None),  # blocked-but-beyond-distance stays unmatched
    }


def test_ngram_blocking_short_names_use_whole_string_key(spark):
    # names shorter than ngram_size contribute themselves as the key
    dirty = spark.createDataFrame([(1, "ab")], "id int, name string")
    ref = spark.createDataFrame([("ab",), ("abcdef",)], "ref string")
    got = fuzzy_match_to_reference(
        dirty, ref, "name", "ref", "id", max_distance=0, blocking="ngram"
    ).collect()
    assert got[0]["matched_name"] == "ab"


def test_unknown_blocking_mode_rejected(spark):
    dirty, ref = _tables(spark)
    with pytest.raises(ValueError):
        fuzzy_match_to_reference(
            dirty, ref, "name", "ref", "id", blocking="soundex"
        )


def test_empty_reference_keeps_all_unmatched(spark):
    dirty = spark.createDataFrame([(1, "zurich")], "id int, name string")
    ref = spark.createDataFrame([], "ref string")
    for mode in ("token", "ngram"):
        got = fuzzy_match_to_reference(
            dirty, ref, "name", "ref", "id", blocking=mode
        ).collect()
        assert len(got) == 1
        assert got[0]["matched_name"] is None


def test_duplicate_reference_rows_do_not_fan_out(spark):
    dirty = spark.createDataFrame([(1, "zurch")], "id int, name string")
    ref = spark.createDataFrame(
        [("zurich",), ("zurich",)], "ref string"
    )  # operator must distinct the reference
    got = fuzzy_match_to_reference(
        dirty, ref, "name", "ref", "id", blocking="ngram"
    ).collect()
    assert len(got) == 1 and got[0]["matched_name"] == "zurich"
