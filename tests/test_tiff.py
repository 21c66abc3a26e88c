"""Baseline TIFF codec (r14): builder/parser roundtrips across byte
order × photometric × strip height (hypothesis), every posture
rejection, strip-integrity checks, and the Spark operators e2e."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import tiff as tf


@settings(deadline=None, max_examples=60)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.booleans(),
    st.sampled_from(["II", "MM"]),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**31),
)
def test_tiff_roundtrip(w, h, rgb, byteorder, rps, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    raw = tf._tiff_image_bytes(px, byteorder, rows_per_strip=rps)
    bo, ch, gw, gh, n_strips, got = tf.parse_tiff_image(raw)
    assert (bo, ch, gw, gh) == (byteorder, 3 if rgb else 1, w, h)
    assert n_strips == (h + rps - 1) // rps
    assert np.array_equal(got, px)


def _gray(w=5, h=7, **kw):
    px = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    return tf._tiff_image_bytes(px, **kw)


def test_tiff_rejections():
    raw = bytearray(_gray())
    raw[:2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        tf.parse_tiff_image(bytes(raw))

    def patched(tag, value):
        px = np.zeros((4, 4), dtype=np.uint8)
        good = tf._tiff_image_bytes(px)
        # patch one inline SHORT value; IFD starts after the 8-byte
        # header + 16 raster bytes
        ifd_at = 8 + 16
        n = int.from_bytes(good[ifd_at : ifd_at + 2], "little")
        buf = bytearray(good)
        for i in range(n):
            e = ifd_at + 2 + 12 * i
            if int.from_bytes(good[e : e + 2], "little") == tag:
                buf[e + 8 : e + 10] = int(value).to_bytes(2, "little")
                return bytes(buf)
        raise AssertionError("tag not found")

    with pytest.raises(ValueError, match="uncompressed"):
        tf.parse_tiff_image(patched(tf.TAG_COMPRESSION, 5))  # LZW
    with pytest.raises(ValueError, match="unsupported TIFF class"):
        tf.parse_tiff_image(patched(tf.TAG_PHOTOMETRIC, 3))  # palette
    with pytest.raises(ValueError, match="8-bit"):
        tf.parse_tiff_image(patched(tf.TAG_BPS, 16))
    with pytest.raises(ValueError, match="chunky"):
        tf.parse_tiff_image(patched(tf.TAG_PLANAR, 2))


def test_tiff_strip_integrity():
    px = np.zeros((8, 4), dtype=np.uint8)
    raw = bytearray(tf._tiff_image_bytes(px, rows_per_strip=3))  # 3 strips
    ifd_at = 8 + 32
    n = int.from_bytes(raw[ifd_at : ifd_at + 2], "little")
    for i in range(n):
        e = ifd_at + 2 + 12 * i
        tag = int.from_bytes(raw[e : e + 2], "little")
        if tag == tf.TAG_STRIP_BYTE_COUNTS:
            # counts live out of line (3 LONGs); corrupt the first
            off = int.from_bytes(raw[e + 8 : e + 12], "little")
            raw[off : off + 4] = (13).to_bytes(4, "little")
    with pytest.raises(ValueError, match="strip 0"):
        tf.parse_tiff_image(bytes(raw))


def test_tiff_missing_required_tag():
    # hand-build a TIFF with no StripOffsets
    from kafka_streams_common_spark.operators.exif import _tiff_bytes

    raw = _tiff_bytes([(tf.TAG_WIDTH, 4, 4), (tf.TAG_HEIGHT, 4, 4)])
    with pytest.raises(ValueError, match="required"):
        tf.parse_tiff_image(raw)


def test_spark_tiff(spark):
    docs = spark.createDataFrame(
        [(i, f"tiff doc {i} {'y' * (i * 13 % 40)}") for i in range(10)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           tf.decode_tiff_features(tf.encode_tiff(docs)).collect()}
    assert len(out) == 10
    for did, r in out.items():
        text = f"tiff doc {did} {'y' * (did * 13 % 40)}"
        hx = hashlib.md5(text.encode()).hexdigest()
        w = int(hx[:15], 16) % 16 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 16 + 1
        ch = 1 if did % 2 == 0 else 3
        n = ch * w * h
        raster = (bytes.fromhex(hx) * ((n + 15) // 16))[:n]
        assert r["byteorder"] == ("II" if did % 2 == 0 else "MM")
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["n_strips"] == (1 if did % 2 == 0 else (h + 3) // 4)
        assert r["mean_px"] == pytest.approx(sum(raster) / n)
        assert r["min_px"] == min(raster) and r["max_px"] == max(raster)


def test_tiff_through_shared_dispatch(spark):
    """The shared magic dispatch opens TIFFs in both byte orders (r14):
    decode_image_features over a TIFF lake recovers the same stats as
    the dedicated decoder."""
    from kafka_streams_common_spark.operators.multimodal import (
        decode_image_features,
    )
    from kafka_streams_common_spark.operators.tiff import encode_tiff

    docs = spark.createDataFrame(
        [(i, f"dispatch doc {i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decode_image_features(encode_tiff(docs)).collect()}
    assert len(out) == 6
    assert all(r["format"] == "tiff" for r in out.values())
    for did, r in out.items():
        hx = hashlib.md5(f"dispatch doc {did}".encode()).hexdigest()
        w = int(hx[:15], 16) % 16 + 1
        ch = 1 if did % 2 == 0 else 3
        assert r["width"] == w
        assert r["channels"] == ch
