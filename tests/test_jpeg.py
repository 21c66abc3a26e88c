"""Baseline JPEG codec tests: DCT orthonormality, hand-computed
entropy bytes for the constant block, round-trip error bounds, dims
cropping, byte stuffing, decoder use of FILE tables (not baked-in),
marker robustness, and the Spark-side reconstruction report."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kafka_streams_common_spark.operators.jpeg import (
    _C,
    _ZIGZAG,
    _encode_jpeg_bytes,
    _parse_jpeg,
    decode_jpeg_recon_report,
    encode_jpeg,
)


def _md5_image(text: str, dim_mod: int = 16) -> np.ndarray:
    hx = hashlib.md5(text.encode()).hexdigest()
    w = int(hx[:15], 16) % dim_mod + 1
    h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % dim_mod + 1
    raster = (bytes.fromhex(hx) * ((w * h + 15) // 16))[: w * h]
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 1)


def test_dct_basis_is_orthonormal_and_zigzag_is_the_spec_pattern():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    # the first two anti-diagonals fix the alternation convention
    assert _ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert sorted(_ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


def test_constant_block_entropy_bytes_hand_computed():
    """With the flat canonical tables (DC size s -> 4-bit code s, EOB ->
    8-bit code 0), a constant-128 8x8 image encodes to DC size 0
    ('0000') + EOB ('00000000') + 1-padding = bytes 00 0F — worked out
    on paper, pinning bit order, padding, and canonical code assignment
    against the spec."""
    pay = _encode_jpeg_bytes(np.full((8, 8, 1), 128, dtype=np.uint8))
    sos_at = pay.index(b"\xff\xda")
    sos_len = int.from_bytes(pay[sos_at + 2 : sos_at + 4], "big")
    entropy = pay[sos_at + 2 + sos_len : -2]
    assert entropy == bytes([0x00, 0x0F])
    _, w, h, got = _parse_jpeg(pay)
    assert (w, h) == (8, 8) and (got == 128).all()


def test_constant_images_reconstruct_through_the_quant_formula():
    """A constant image has only a DC coefficient: reconstruction must
    equal round(round(8(c-128)/Q0) * Q0 / 8) + 128 exactly — the
    quantize/dequantize arithmetic with zero transform error."""
    for c in (0, 7, 77, 128, 200, 255):
        pay = _encode_jpeg_bytes(np.full((5, 9, 1), c, dtype=np.uint8))
        _, w, h, got = _parse_jpeg(pay)
        dc = np.rint(8 * (c - 128.0) / 6)
        want = int(np.clip(np.rint(dc * 6 / 8 + 128.0), 0, 255))
        assert (w, h) == (9, 5)
        assert (got == want).all(), (c, want, np.unique(got))


def test_roundtrip_error_bounds_and_dims():
    """md5 rasters (white noise — the hardest DCT content) and random
    images must reconstruct within the gate bounds used by the
    registered query (max 32 / mean 12; measured worst 18 / 7.25)."""
    rng = np.random.RandomState(42)
    for trial in range(30):
        if trial % 2:
            px = _md5_image(f"doc{trial}")
        else:
            w, h = int(rng.randint(1, 33)), int(rng.randint(1, 33))
            px = rng.randint(0, 256, size=(h, w, 1)).astype(np.uint8)
        c, gw, gh, got = _parse_jpeg(_encode_jpeg_bytes(px))
        assert (c, gw, gh) == (1, px.shape[1], px.shape[0])
        err = np.abs(got.astype(int) - px.astype(int))
        assert err.max() <= 32 and err.mean() <= 12.0


def test_byte_stuffing_occurs_and_roundtrips():
    """The entropy stream must hit 0xFF bytes on varied content; the
    writer stuffs 0x00 after each and the reader strips it."""
    rng = np.random.RandomState(3)
    stuffed = 0
    for _ in range(20):
        px = rng.randint(0, 256, size=(16, 16, 1)).astype(np.uint8)
        pay = _encode_jpeg_bytes(px)
        sos_at = pay.index(b"\xff\xda")
        sos_len = int.from_bytes(pay[sos_at + 2 : sos_at + 4], "big")
        stuffed += pay[sos_at + 2 + sos_len : -2].count(b"\xff\x00")
        _parse_jpeg(pay)  # must decode cleanly
    assert stuffed > 0


def test_decoder_uses_tables_from_the_file():
    """Dequantization must use the DQT carried IN THE FILE: patching
    the stored Q[0] from 6 to 12 doubles the decoded DC — the decoder
    cannot be baking in the encoder's table."""
    pay = bytearray(_encode_jpeg_bytes(np.full((8, 8, 1), 200, dtype=np.uint8)))
    dqt_at = pay.index(b"\xff\xdb")
    assert pay[dqt_at + 5] == 6  # Q[0,0] in zigzag order
    _, _, _, before = _parse_jpeg(bytes(pay))
    pay[dqt_at + 5] = 12
    _, _, _, after = _parse_jpeg(bytes(pay))
    # stored DC = rint(8*72/6) = 96; decode = clip(rint(96*Q0/8)+128)
    assert (before == 200).all()
    assert (after == 255).all()  # 96*12/8 + 128 = 272 -> clipped


def test_rejects_malformed_and_unsupported():
    px = np.full((4, 4, 1), 99, dtype=np.uint8)
    good = _encode_jpeg_bytes(px)
    with pytest.raises(ValueError, match="not a JPEG"):
        _parse_jpeg(b"\x89PNG" + good)
    with pytest.raises(ValueError):
        _parse_jpeg(good[:40])
    sof2 = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        _parse_jpeg(sof2)
    # truncated entropy stream
    with pytest.raises(ValueError):
        _parse_jpeg(good[:-4])


def test_jpeg_dispatch_in_decode_image():
    from kafka_streams_common_spark.operators.multimodal import _decode_image

    px = _md5_image("hello world")
    stats = _decode_image(_encode_jpeg_bytes(px))
    assert stats["format"] == "jpeg"
    assert (stats["width"], stats["height"]) == (px.shape[1], px.shape[0])
    # lossy: stats must be NEAR the source, not equal by construction
    assert abs(stats["mean_px"] - px.mean()) <= 12.0


def test_encode_jpeg_spark_and_recon_report(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta"), (3, "gamma!"), (4, "delta? epsilon")],
        ["doc_id", "text"],
    )
    texts = {1: "alpha", 2: "beta beta", 3: "gamma!", 4: "delta? epsilon"}
    rows = {r["doc_id"]: r.asDict() for r in
            decode_jpeg_recon_report(encode_jpeg(docs)).collect()}
    assert len(rows) == 4
    for did, text in texts.items():
        px = _md5_image(text)
        r = rows[did]
        assert r["format"] == "jpeg"
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["n_px"] == px.shape[0] * px.shape[1]
        assert r["max_err_le_32"] is True
        assert r["mean_err_le_12"] is True
