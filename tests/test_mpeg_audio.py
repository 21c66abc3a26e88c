"""MPEG-audio metadata scan (r14): frame-walk round trips across the
bitrate/samplerate/mode tables, per-frame padding arithmetic, rejection
paths, and the Spark operator against a pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.mpeg_audio import (
    CHANNEL_MODES,
    MPEG1_L3_BITRATES,
    MPEG1_SAMPLERATES,
    _id3v1_tag,
    _mp3_bytes,
    _mp3_frame_len,
    _parse_mp3_meta,
    decode_mp3_meta,
    encode_mp3_meta,
)


@settings(deadline=None, max_examples=60)
@given(
    n_frames=st.integers(1, 9),
    bidx=st.integers(1, 14),
    sidx=st.integers(0, 2),
    mode=st.integers(0, 3),
    year=st.integers(0, 9999),
    genre=st.integers(0, 255),
)
def test_mp3_meta_roundtrip(n_frames, bidx, sidx, mode, year, genre):
    blob = _mp3_bytes(
        n_frames, bidx, sidx, mode, b"\xabfill", "t" * 30, "art", "alb", year, genre
    )
    m = _parse_mp3_meta(blob)
    assert m["n_frames"] == n_frames
    assert m["bitrate_kbps"] == MPEG1_L3_BITRATES[bidx]
    assert m["sample_rate"] == MPEG1_SAMPLERATES[sidx]
    assert m["channel_mode"] == CHANNEL_MODES[mode]
    assert m["duration_ms"] == n_frames * 1152 * 1000 // MPEG1_SAMPLERATES[sidx]
    assert (m["title"], m["artist"], m["album"]) == ("t" * 30, "art", "alb")
    assert (m["year"], m["genre_id"]) == (year, genre)


def test_mp3_frame_len_spec_values():
    # 128 kbps @ 44100 Hz: floor(144*128000/44100) = 417 (+1 padded) —
    # the canonical textbook example of the Layer III length formula
    assert _mp3_frame_len(9, 0, False) == 417
    assert _mp3_frame_len(9, 0, True) == 418
    # 320 kbps @ 32000 Hz: 144*320000/32000 = 1440 exactly
    assert _mp3_frame_len(14, 2, False) == 1440


def test_mp3_rejection_paths():
    blob = _mp3_bytes(3, 9, 0, 0, b"xy", "t", "a", "b", 2001, 17)
    with pytest.raises(ValueError, match="sync"):
        _parse_mp3_meta(b"\x00" + blob[1:])
    # free-format bitrate index on frame 0
    bad = bytearray(blob)
    bad[2] &= 0x0F
    with pytest.raises(ValueError, match="free-format|reserved"):
        _parse_mp3_meta(bytes(bad))
    # reserved samplerate index
    bad = bytearray(blob)
    bad[2] |= 0b1100
    with pytest.raises(ValueError, match="samplerate"):
        _parse_mp3_meta(bytes(bad))
    # Layer II
    bad = bytearray(blob)
    bad[1] = (bad[1] & ~0b110) | 0b100
    with pytest.raises(ValueError, match="Layer III"):
        _parse_mp3_meta(bytes(bad))
    # MPEG-2
    bad = bytearray(blob)
    bad[1] = (bad[1] & ~0b11000) | 0b10000
    with pytest.raises(ValueError, match="MPEG-1"):
        _parse_mp3_meta(bytes(bad))
    # CRC-protected
    bad = bytearray(blob)
    bad[1] &= ~1
    with pytest.raises(ValueError, match="CRC"):
        _parse_mp3_meta(bytes(bad))
    # VBR: bitrate change on the second frame
    f0_len = _mp3_frame_len(9, 0, True)  # frame 0 is padded
    bad = bytearray(blob)
    bad[f0_len + 2] = (bad[f0_len + 2] & 0x0F) | (10 << 4)
    with pytest.raises(ValueError, match="VBR"):
        _parse_mp3_meta(bytes(bad))
    # missing tag
    with pytest.raises(ValueError, match="ID3v1|truncated"):
        _parse_mp3_meta(blob[:-128])
    # broken tag magic
    bad = bytearray(blob)
    bad[-128] ^= 1
    with pytest.raises(ValueError, match="ID3v1|sync"):
        _parse_mp3_meta(bytes(bad))


def test_id3v1_layout():
    tag = _id3v1_tag("title", "artist", "album", 1999, "comment", 42)
    assert len(tag) == 128
    assert tag[:3] == b"TAG"
    assert tag[3:33] == b"title" + b"\x00" * 25
    assert tag[93:97] == b"1999"
    assert tag[127] == 42


def test_mp3_spark_meta_matches_replay(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (5, "beta beta"), (13, "gamma!")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_mp3_meta(encode_mp3_meta(docs)).collect()}
    for did, text in ((0, "alpha"), (5, "beta beta"), (13, "gamma!")):
        r = rows[did]
        sr = MPEG1_SAMPLERATES[did % 3]
        nf = len(text.encode()) % 8 + 2
        assert r["n_frames"] == nf
        assert r["bitrate_kbps"] == MPEG1_L3_BITRATES[did % 14 + 1]
        assert r["sample_rate"] == sr
        assert r["channel_mode"] == CHANNEL_MODES[did % 4]
        assert r["duration_ms"] == nf * 1152 * 1000 // sr
        assert r["title"] == hashlib.md5(text.encode()).hexdigest()[:30]
        assert r["year"] == 1980 + did % 40
        assert r["genre_id"] == did % 80
