"""EXIF/TIFF tier (r14): known-bytes header pins, both byte orders,
inline vs out-of-line values, JPEG APP1 splice + marker walk, rejection
paths, and the Spark operators against a pure-Python replay."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.exif import (
    TAG_DATETIME,
    TAG_IMAGE_WIDTH,
    TAG_MAKE,
    TAG_ORIENTATION,
    _TYPE_ASCII,
    _TYPE_LONG,
    _TYPE_SHORT,
    _find_exif,
    _md5_exif_fields,
    _parse_tiff_ifd0,
    _tiff_bytes,
    decode_jpeg_exif,
    encode_jpeg_exif,
    exif_app1,
)


def test_tiff_known_bytes_little_endian():
    """Hand-checked layout: header II*, IFD at 8, one inline SHORT."""
    t = _tiff_bytes([(TAG_ORIENTATION, _TYPE_SHORT, 6)], "II")
    assert t[:8] == b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
    assert t[8:10] == (1).to_bytes(2, "little")  # one entry
    e = t[10:22]
    assert e[0:2] == TAG_ORIENTATION.to_bytes(2, "little")
    assert e[2:4] == (3).to_bytes(2, "little")  # SHORT
    assert e[4:8] == (1).to_bytes(4, "little")  # count 1
    assert e[8:10] == (6).to_bytes(2, "little")  # inline, left-justified
    assert e[10:12] == b"\x00\x00"
    assert t[22:26] == b"\x00\x00\x00\x00"  # no IFD1


@settings(deadline=None, max_examples=30)
@given(
    bo=st.sampled_from(["II", "MM"]),
    make=st.text(alphabet="abcdefghij-0123456789", min_size=0, max_size=24),
    width=st.integers(1, 2**31 - 1),
    orientation=st.integers(1, 8),
)
def test_tiff_roundtrip_both_byte_orders(bo, make, width, orientation):
    t = _tiff_bytes(
        [
            (TAG_MAKE, _TYPE_ASCII, make),
            (TAG_ORIENTATION, _TYPE_SHORT, orientation),
            (TAG_IMAGE_WIDTH, _TYPE_LONG, width),
        ],
        bo,
    )
    tags = _parse_tiff_ifd0(t)
    assert tags[TAG_MAKE] == make
    assert tags[TAG_ORIENTATION] == orientation
    assert tags[TAG_IMAGE_WIDTH] == width


def test_tiff_and_app1_rejection_paths():
    t = _tiff_bytes([(TAG_ORIENTATION, _TYPE_SHORT, 1)], "II")
    with pytest.raises(ValueError, match="byte-order"):
        _parse_tiff_ifd0(b"XX" + t[2:])
    with pytest.raises(ValueError, match="magic"):
        _parse_tiff_ifd0(t[:2] + b"\x2b\x00" + t[4:])
    with pytest.raises(ValueError, match="unsupported TIFF type"):
        _tiff_bytes([(TAG_ORIENTATION, 11, 1)], "II")
    # a JPEG with no APP1 has no EXIF
    from kafka_streams_common_spark.operators.jpeg import _encode_jpeg_bytes
    import numpy as np

    plain = _encode_jpeg_bytes(np.zeros((2, 2, 1), dtype=np.uint8))
    with pytest.raises(ValueError, match="no Exif APP1"):
        _find_exif(plain)
    # spliced APP1 is found even after other APPn/COM segments
    app1 = exif_app1([(TAG_ORIENTATION, _TYPE_SHORT, 3)], "MM")
    com = b"\xff\xfe" + (9).to_bytes(2, "big") + b"comment"
    spliced = plain[:2] + com + app1 + plain[2:]
    assert _parse_tiff_ifd0(_find_exif(spliced))[TAG_ORIENTATION] == 3


def test_exif_spark_fields_match_replay(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta beta"), (2, "gamma!"), (3, "delta?")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_jpeg_exif(encode_jpeg_exif(docs)).collect()}
    for did, text in ((0, "alpha"), (1, "beta beta"), (2, "gamma!"), (3, "delta?")):
        make, dt, orientation, hx = _md5_exif_fields(text)
        w = int(hx[:15], 16) % 16 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 16 + 1
        r = rows[did]
        assert r["byte_order"] == ("II" if did % 2 == 0 else "MM")
        assert r["make"] == make
        assert r["datetime"] == dt
        assert r["orientation"] == orientation
        assert r["exif_width"] == w == r["sof_width"]
        assert r["sof_height"] == h
        # the payload is still a VALID decodable JPEG with the splice
    from kafka_streams_common_spark.operators.jpeg import _parse_jpeg

    payload = bytes(
        encode_jpeg_exif(docs).filter("doc_id = 1").collect()[0]["payload"]
    )
    c, w, h, px = _parse_jpeg(payload)
    assert c == 1 and w >= 1 and h >= 1
