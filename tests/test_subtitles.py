"""SRT/WebVTT tier (r14): timestamp formatting/parsing properties,
dialect strictness (counters, separators, padding, time order),
roundtrips in both dialects, Spark e2e."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import subtitles as sub


@settings(deadline=None, max_examples=120)
@given(st.integers(min_value=0, max_value=99 * 3_600_000), st.sampled_from([",", "."]))
def test_timestamp_roundtrip(ms, sep):
    assert sub._parse_ts(sub._fmt_ts(ms, sep), sep) == ms


def test_timestamp_strictness():
    with pytest.raises(ValueError, match="separator"):
        sub._parse_ts("00:00:01.000", ",")
    with pytest.raises(ValueError, match="millisecond"):
        sub._parse_ts("00:00:01,00", ",")
    with pytest.raises(ValueError, match="zero-padded"):
        sub._parse_ts("00:0:01,000", ",")
    with pytest.raises(ValueError, match="out of range"):
        sub._parse_ts("00:61:01,000", ",")


_cues = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1,
        max_size=50,
    ),
    min_size=1,
    max_size=6,
)


@settings(deadline=None, max_examples=60)
@given(_cues, st.booleans())
def test_cue_roundtrip(texts, use_vtt):
    cues = [(i * 1500, i * 1500 + 1200, t.strip() or "x") for i, t in enumerate(texts)]
    raw = sub.build_vtt(cues) if use_vtt else sub.build_srt(cues)
    fmt, got = sub.parse_cues(raw)
    assert fmt == ("vtt" if use_vtt else "srt")
    assert got == cues


def test_srt_counter_and_order_enforced():
    cues = [(0, 1000, "a"), (1100, 2100, "b")]
    raw = sub.build_srt(cues)
    with pytest.raises(ValueError, match="counter"):
        sub.parse_cues(raw.replace("2\r\n", "3\r\n"))
    # end before start
    bad = "1\r\n00:00:02,000 --> 00:00:01,000\r\nx\r\n"
    with pytest.raises(ValueError, match="not after"):
        sub.parse_cues(bad)
    # out of time order
    bad = (
        "1\r\n00:00:05,000 --> 00:00:06,000\r\nx\r\n\r\n"
        "2\r\n00:00:01,000 --> 00:00:02,000\r\ny\r\n"
    )
    with pytest.raises(ValueError, match="time order"):
        sub.parse_cues(bad)
    # a VTT timestamp inside an SRT file
    with pytest.raises(ValueError, match="separator"):
        sub.parse_cues("1\r\n00:00:00.000 --> 00:00:01.000\r\nx\r\n")


def test_multiline_cue_text():
    raw = "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\nline one\nline two\n"
    fmt, cues = sub.parse_cues(raw)
    assert fmt == "vtt" and cues[0][2] == "line one\nline two"


def test_spark_subtitles(spark):
    docs = spark.createDataFrame(
        [(i, f"caption doc {i} " + "s" * (i * 53 % 300)) for i in range(8)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           sub.decode_subtitles(sub.encode_subtitles(docs)).collect()}
    for did, r in out.items():
        text = f"caption doc {did} " + "s" * (did * 53 % 300)
        n = -(-len(text) // 120)
        dur = 2000 + did % 1000
        assert r["format"] == ("srt" if did % 2 == 0 else "vtt")
        assert r["n_cues"] == n
        assert r["span_ms"] == n * dur + (n - 1) * 100
        assert r["caption_md5"] == hashlib.md5(text.encode()).hexdigest()
