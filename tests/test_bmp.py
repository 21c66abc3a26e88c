"""Windows BMP codec (r14): round trips across the padding boundary
widths, top-down vs bottom-up row order, rejection paths, and the Spark
decode against a pure-Python replay of the digest-raster derivation."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.multimodal import (
    _encode_bmp_bytes,
    _parse_bmp,
    _parse_image,
    encode_bmp,
    decode_image_features,
)


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_all_strides(w, h, seed):
    # widths 1..20 cover every (3*w) % 4 padding residue
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = _encode_bmp_bytes(px)
    ch, ww, hh, out = _parse_bmp(blob)
    assert (ch, ww, hh) == (3, w, h)
    assert (out == px).all()
    fmt, ch2, w2, h2, out2 = _parse_image(blob)
    assert fmt == "bmp" and (out2 == px).all()


def test_bmp_top_down_negative_height():
    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    blob = bytearray(_encode_bmp_bytes(px))
    # rewrite height negative and flip the stored rows: same image,
    # expressed top-down — both signs are legal in the wild
    stride = (3 * 5 + 3) & ~3
    rows = [bytes(blob[54 + y * stride : 54 + (y + 1) * stride]) for y in range(4)]
    blob[54:] = b"".join(reversed(rows))
    blob[22:26] = (-4).to_bytes(4, "little", signed=True)
    ch, w, h, out = _parse_bmp(bytes(blob))
    assert (ch, w, h) == (3, 5, 4)
    assert (out == px).all()


def test_bmp_rejection_paths():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = _encode_bmp_bytes(px)
    with pytest.raises(ValueError, match="not a BMP"):
        _parse_bmp(b"XX" + blob[2:])
    with pytest.raises(ValueError, match="file-size"):
        _parse_bmp(blob + b"junk")
    bad = bytearray(blob)
    bad[28:30] = (32).to_bytes(2, "little")
    with pytest.raises(ValueError, match="24-bpp"):
        _parse_bmp(bytes(bad))
    bad = bytearray(blob)
    bad[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        _parse_bmp(bytes(bad))
    bad = bytearray(blob)
    bad[26:28] = (2).to_bytes(2, "little")
    with pytest.raises(ValueError, match="planes"):
        _parse_bmp(bytes(bad))
    bad = bytearray(blob[:-1])  # truncated raster, size field fixed up
    bad[2:6] = len(bad).to_bytes(4, "little")
    with pytest.raises(ValueError, match="raster"):
        _parse_bmp(bytes(bad))
    # encoder contract
    with pytest.raises(ValueError, match="uint8 RGB"):
        _encode_bmp_bytes(np.zeros((2, 2, 1), dtype=np.uint8))


def test_bmp_spark_decode_matches_replay(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta"), (3, "gamma!")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_image_features(encode_bmp(docs)).collect()}
    for did, text in ((1, "alpha"), (2, "beta beta"), (3, "gamma!")):
        hx = hashlib.md5(text.encode()).hexdigest()
        w = int(hx[:15], 16) % 16 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 16 + 1
        raster = np.frombuffer(
            (bytes.fromhex(hx) * ((3 * w * h + 15) // 16))[: 3 * w * h], np.uint8
        )
        r = rows[did]
        assert (r["format"], r["channels"], r["width"], r["height"]) == (
            "bmp", 3, w, h,
        )
        assert abs(r["mean_px"] - raster.astype(np.int64).mean()) < 1e-12
        assert r["min_px"] == int(raster.min())
        assert r["max_px"] == int(raster.max())
