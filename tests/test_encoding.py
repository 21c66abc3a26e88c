"""Encoding census + repair (r14): the four-class detection ladder,
repair inverses (property: plant → classify → repair recovers the
text), undefined-cp1252 rejection, and the Spark operator against a
pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.encoding import (
    _SUFFIX_PLAIN,
    _SUFFIX_QUOTED,
    _classify_and_repair,
    encoding_census,
    plant_encoding_lake,
)

# printable ASCII — the corpus contract the planted lake documents
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=200,
)


@settings(deadline=None, max_examples=80)
@given(text=_ascii_text, klass=st.integers(0, 3))
def test_plant_classify_repair_inverse(text, klass):
    if klass == 0:
        payload = (text + _SUFFIX_PLAIN).encode("utf-8")
        want = ("utf8", text + _SUFFIX_PLAIN)
    elif klass == 1:
        payload = (
            (text + _SUFFIX_PLAIN).encode("utf-8").decode("latin-1").encode("utf-8")
        )
        want = ("double_utf8", text + _SUFFIX_PLAIN)
    elif klass == 2:
        payload = (text + _SUFFIX_QUOTED).encode("cp1252")
        want = ("cp1252", text + _SUFFIX_QUOTED)
    else:
        payload = (text + _SUFFIX_PLAIN).encode("latin-1")
        want = ("latin1", text + _SUFFIX_PLAIN)
    assert _classify_and_repair(payload) == want


@settings(deadline=None, max_examples=40)
@given(text=st.text(min_size=0, max_size=200))
def test_double_encode_repair_any_unicode(text):
    # the double-utf8 inverse holds for ARBITRARY unicode text, not
    # just the ASCII corpus — every utf-8 byte is latin-1 decodable
    payload = text.encode("utf-8").decode("latin-1").encode("utf-8")
    enc, repaired = _classify_and_repair(payload)
    if any(ord(c) > 0x7F for c in text):
        assert enc == "double_utf8"
    assert repaired == text or enc == "utf8"  # pure-ASCII text is clean


def test_undefined_cp1252_byte_rejected():
    with pytest.raises(ValueError, match="cp1252"):
        _classify_and_repair(b"broken \x81 byte")


def test_mixed_c1_heuristic_boundaries():
    # 0x9F is the last C1 byte -> cp1252 branch; 0xA0 is latin-1 NBSP
    assert _classify_and_repair(b"x \x99 y")[0] == "cp1252"  # TM sign
    assert _classify_and_repair(b"x \xe9 y")[0] == "latin1"


def test_encoding_spark_census_matches_replay(spark):
    texts = {0: "alpha", 1: "beta beta", 2: "gamma!", 3: "delta four"}
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict()
            for r in encoding_census(plant_encoding_lake(docs)).collect()}
    extra = {0: 6, 1: 8, 2: 7, 3: 5}
    classes = {0: "utf8", 1: "double_utf8", 2: "cp1252", 3: "latin1"}
    for did, text in texts.items():
        r = rows[did]
        suffix = _SUFFIX_QUOTED if did % 4 == 2 else _SUFFIX_PLAIN
        assert r["encoding"] == classes[did]
        assert r["n_bytes"] == len(text.encode()) + extra[did]
        assert r["repaired_md5"] == hashlib.md5(
            (text + suffix).encode("utf-8")
        ).hexdigest()
