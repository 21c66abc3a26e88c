"""Property-based tests for the multimodal container parsers.

Each strategy builds payloads from the PUBLIC spec (independent of the
repo's encoders — so these pin the parsers against the format space,
not just against our own output): random dims/samples/frame counts,
optional comments / unknown chunks / padding, then asserts the parser
recovers exactly the planted content. Complements the byte-exact
encoder round-trips in test_operators.py.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.multimodal import (
    _parse_netpbm,
    _parse_wav,
    _parse_y4m,
)

dims = st.integers(min_value=1, max_value=32)


@settings(max_examples=60, deadline=None)
@given(
    w=dims,
    h=dims,
    channels=st.sampled_from([1, 3]),
    comment=st.booleans(),
    data=st.data(),
)
def test_netpbm_parse_recovers_planted_raster(w, h, channels, comment, data):
    n = w * h * channels
    raster = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    magic = b"P5" if channels == 1 else b"P6"
    header = magic + b"\n"
    if comment:
        header += b"# a comment\n"
    header += f"{w} {h}\n255\n".encode()
    got_c, got_w, got_h, px = _parse_netpbm(header + raster)
    assert (got_c, got_w, got_h) == (channels, w, h)
    assert px.shape == (h, w, channels)
    assert px.ravel().tolist() == list(raster)


@settings(max_examples=60, deadline=None)
@given(
    bits=st.sampled_from([8, 16]),
    rate=st.sampled_from([8000, 16000, 44100]),
    extra_first=st.booleans(),
    data=st.data(),
)
def test_wav_parse_recovers_planted_samples(bits, rate, extra_first, data):
    n = data.draw(st.integers(min_value=1, max_value=200))
    if bits == 8:
        samples = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        raw = bytes(samples)
    else:
        samples = data.draw(
            st.lists(st.integers(-32768, 32767), min_size=n, max_size=n)
        )
        raw = b"".join(struct.pack("<h", v) for v in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * bits // 8, bits // 8, bits)
    chunks = b""
    # an unknown odd-sized chunk exercises the word-alignment skip
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    if extra_first:
        chunks += extra
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if not extra_first:
        chunks += extra
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    channels, got_rate, got_bits, s = _parse_wav(payload)
    assert (channels, got_rate, got_bits) == (1, rate, bits)
    assert s[:, 0].tolist() == samples


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    nf=st.integers(min_value=1, max_value=6),
    c420=st.booleans(),
    frame_params=st.booleans(),
    data=st.data(),
)
def test_y4m_parse_recovers_planted_frames(w, h, nf, c420, frame_params, data):
    if c420:
        # C420 plane sizes need even-ish dims to be meaningful, but the
        # spec arithmetic (w//2 * h//2) is what the parser implements —
        # exercise it for any dims
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
        header = f"YUV4MPEG2 W{w} H{h} F25:1 C420jpeg\n".encode()
    else:
        frame_size = w * h
        header = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    frames, payload = [], header
    for _ in range(nf):
        raw = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=frame_size, max_size=frame_size)
            )
        )
        marker = b"FRAME Xsome=param\n" if frame_params else b"FRAME\n"
        payload += marker + raw
        frames.append(raw[: w * h])
    got_w, got_h, got_frames = _parse_y4m(payload)
    assert (got_w, got_h, len(got_frames)) == (w, h, nf)
    for want, got in zip(frames, got_frames):
        assert got.shape == (h, w)
        assert got.ravel().tolist() == list(want)
        assert got.dtype == np.uint8


# --- PNG (r12: the compressed-container branch) -------------------------

from kafka_streams_common_spark.operators.multimodal import (  # noqa: E402
    _encode_png_bytes,
    _parse_png,
    _png_chunk,
)


@settings(max_examples=80, deadline=None)
@given(
    w=dims,
    h=dims,
    channels=st.sampled_from([1, 3]),
    level=st.sampled_from([0, 1, 6, 9]),
    filter_seed=st.integers(0, 4),
    ancillary=st.booleans(),
    split_idat=st.booleans(),
    data=st.data(),
)
def test_png_roundtrip_recovers_planted_pixels(
    w, h, channels, level, filter_seed, ancillary, split_idat, data
):
    """Random pixels → encode (every filter type via the cycling seed,
    stored blocks AND real DEFLATE) → parse recovers the exact array.
    Optional spec hazards: an ancillary chunk between IDAT and IEND
    (must be CRC-checked then skipped) and IDAT split across two chunks
    (inflate must concatenate)."""
    n = w * h * channels
    px = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    ).reshape(h, w, channels)
    payload = _encode_png_bytes(px, level=level, filter_seed=filter_seed)
    if split_idat:
        # re-frame the single IDAT as two chunks at an arbitrary split
        sig_ihdr = payload[: 8 + 25]
        idat_len = int.from_bytes(payload[8 + 25 : 8 + 29], "big")
        idat_data = payload[8 + 25 + 8 : 8 + 25 + 8 + idat_len]
        iend = payload[8 + 25 + 12 + idat_len :]
        cut = data.draw(st.integers(0, len(idat_data)))
        payload = (
            sig_ihdr
            + _png_chunk(b"IDAT", idat_data[:cut])
            + _png_chunk(b"IDAT", idat_data[cut:])
            + iend
        )
    if ancillary:
        iend_at = payload.rindex(b"IEND") - 4
        payload = payload[:iend_at] + _png_chunk(b"tEXt", b"k\x00v") + payload[iend_at:]
    got_c, got_w, got_h, got = _parse_png(payload)
    assert (got_c, got_w, got_h) == (channels, w, h)
    assert np.array_equal(got, px)


def test_png_parser_rejects_malformed():
    """Error paths pinned: bad signature, corrupted CRC, truncated
    chunk, unsupported depth/colortype/interlace, inflated-size
    mismatch, missing IEND."""
    import pytest

    px = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    good = _encode_png_bytes(px, level=6)

    with pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"\x89PNX" + good[4:])
    # flip a bit inside the IDAT data -> CRC mismatch
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        _parse_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        _parse_png(good[:-6])
    # 16-bit depth is SUPPORTED since r14 — but relabeling an 8-bit
    # stream as 16-bit must fail the exact size check, not decode
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[8] = 16
    deep = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="inflated data"):
        _parse_png(deep)
    # sub-byte depths stay rejected (re-framed so the CRC is valid)
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[8] = 4
    shallow = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="unsupported PNG"):
        _parse_png(shallow)
    # 16-bit indexed is a spec violation and stays rejected
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[8], ihdr[9] = 16, 3
    deep_idx = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="unsupported PNG"):
        _parse_png(deep_idx)
    # Adam7 is SUPPORTED since r13 — but relabeling a SEQUENTIAL stream
    # as interlaced must fail the exact Adam7 size check, not decode
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[12] = 1
    inter = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="Adam7 size"):
        _parse_png(inter)
    # an out-of-spec interlace method stays rejected
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[12] = 2
    bad2 = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="unsupported PNG"):
        _parse_png(bad2)
    # geometry lie: IHDR claims an extra row -> inflated size mismatch
    ihdr = bytearray(good[8 + 8 : 8 + 8 + 13])
    ihdr[4:8] = (4).to_bytes(4, "big")
    lie = good[:8] + _png_chunk(b"IHDR", bytes(ihdr)) + good[8 + 25 :]
    with pytest.raises(ValueError, match="inflated data"):
        _parse_png(lie)
    # IEND missing
    with pytest.raises(ValueError, match="missing"):
        _parse_png(good[: good.rindex(b"IEND") - 4])


# --- GIF (r12 wave 2: the LZW compressed branch) -------------------------

from kafka_streams_common_spark.operators.gif import (  # noqa: E402
    _encode_gif_bytes,
    _lzw_compress,
    _lzw_decompress,
    _parse_gif,
)


@settings(max_examples=80, deadline=None)
@given(
    w=dims,
    h=dims,
    uncompressed=st.booleans(),
    gif89a=st.booleans(),
    extension=st.booleans(),
    data=st.data(),
)
def test_gif_roundtrip_recovers_planted_pixels(
    w, h, uncompressed, gif89a, extension, data
):
    """Random pixels → encode (real variable-width LZW AND the
    CLEAR-per-pixel framing) → parse recovers the exact array. Spec
    hazards: GIF89a header; an extension block (label + sub-blocks)
    spliced before the image descriptor, which the parser must skip
    by its own framing."""
    n = w * h
    px = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    ).reshape(h, w, 1)
    payload = _encode_gif_bytes(px, uncompressed=uncompressed)
    if gif89a:
        payload = b"GIF89a" + payload[6:]
    if extension:
        desc_at = payload.index(b"\x2c", 13 + 768)
        body = bytes(data.draw(st.lists(st.integers(0, 255), min_size=0, max_size=40)))
        ext = b"\x21\xfe"
        for i in range(0, len(body), 20):
            block = body[i : i + 20]
            if block:
                ext += bytes([len(block)]) + block
        ext += b"\x00"
        payload = payload[:desc_at] + ext + payload[desc_at:]
    got_c, got_w, got_h, got = _parse_gif(payload)
    assert (got_c, got_w, got_h) == (1, w, h)
    assert np.array_equal(got, px)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_gif_lzw_roundtrip_arbitrary_streams(data):
    """LZW over arbitrary byte streams (not just rasters): repeats,
    long runs, and high-entropy segments all round-trip; the KwKwK
    decoder branch and width bumps get hit by construction on runs."""
    parts = data.draw(
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(1, 400)),
            min_size=0,
            max_size=12,
        )
    )
    raw = b"".join(bytes([v]) * k for v, k in parts)
    assert _lzw_decompress(_lzw_compress(raw)) == raw
    assert _lzw_decompress(_lzw_compress(raw, uncompressed=True)) == raw


# --- JPEG (r12 wave 2: the lossy DCT branch) ------------------------------

from kafka_streams_common_spark.operators.jpeg import (  # noqa: E402
    _encode_jpeg_bytes,
    _parse_jpeg,
)


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, data=st.data())
def test_jpeg_roundtrip_dims_exact_and_error_bounded(w, h, data):
    """Random pixels → encode → decode: dims recovered EXACTLY from
    SOF0 (incl. non-multiple-of-8 crops), reconstruction inside the
    registered gate bounds (max 32 / mean 12), and smooth content
    (constant rows) reconstructs tighter than noise."""
    n = w * h
    px = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    ).reshape(h, w, 1)
    got_c, got_w, got_h, got = _parse_jpeg(_encode_jpeg_bytes(px))
    assert (got_c, got_w, got_h) == (1, w, h)
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 32
    assert err.mean() <= 12.0


@settings(max_examples=30, deadline=None)
@given(
    w=dims,
    h=dims,
    level=st.sampled_from([0, 6]),
    filter_seed=st.integers(0, 4),
    data=st.data(),
)
def test_png_indexed_palette_roundtrip(w, h, level, filter_seed, data):
    """Color type 3 (r13): random INDEXES encode with the affine
    non-identity gray palette and must come back as the MAPPED luma
    (7i+13 mod 256) — a decoder passing indexes through fails; a
    non-gray palette comes back as mapped RGB."""
    from kafka_streams_common_spark.operators.multimodal import (
        _AFFINE_GRAY_PALETTE,
    )

    n = w * h
    idx = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    ).reshape(h, w, 1)
    payload = _encode_png_bytes(
        idx, level=level, filter_seed=filter_seed, palette=_AFFINE_GRAY_PALETTE
    )
    c, gw, gh, got = _parse_png(payload)
    assert (c, gw, gh) == (1, w, h)
    assert np.array_equal(got[:, :, 0], (idx[:, :, 0].astype(int) * 7 + 13) % 256)

    # non-gray palette: entry i -> (i, 0, 255-i) must map to RGB
    pal = bytes(v for i in range(256) for v in (i, 0, 255 - i))
    c, _, _, rgb = _parse_png(
        _encode_png_bytes(idx, level=level, filter_seed=filter_seed, palette=pal)
    )
    assert c == 3
    assert np.array_equal(rgb[:, :, 0], idx[:, :, 0])
    assert np.array_equal(rgb[:, :, 2], 255 - idx[:, :, 0].astype(int))


def test_png_indexed_rejects_bad_palettes():
    import pytest

    from kafka_streams_common_spark.operators.multimodal import (
        _AFFINE_GRAY_PALETTE,
        _png_chunk,
    )

    idx = np.array([[[0], [200]]], dtype=np.uint8)
    good = _encode_png_bytes(idx, palette=_AFFINE_GRAY_PALETTE)
    with pytest.raises(ValueError, match="1-256 RGB triples"):
        _encode_png_bytes(idx, palette=b"\x01\x02")  # not a multiple of 3
    with pytest.raises(ValueError, match="1-channel index"):
        _encode_png_bytes(np.zeros((1, 1, 3), dtype=np.uint8),
                          palette=_AFFINE_GRAY_PALETTE)
    # strip the PLTE chunk -> indexed image without a palette
    plte_at = good.index(b"PLTE") - 4
    plte_len = int.from_bytes(good[plte_at : plte_at + 4], "big")
    no_plte = good[:plte_at] + good[plte_at + 12 + plte_len :]
    with pytest.raises(ValueError, match="requires a PLTE"):
        _parse_png(no_plte)
    # a too-short palette makes index 200 out of range
    short = good[:plte_at] + _png_chunk(b"PLTE", b"\x00\x00\x00" * 10) \
        + good[plte_at + 12 + plte_len :]
    with pytest.raises(ValueError, match="index out of range"):
        _parse_png(short)


@settings(max_examples=40, deadline=None)
@given(
    w=dims,
    h=dims,
    channels=st.sampled_from([1, 3]),
    level=st.sampled_from([0, 6]),
    filter_seed=st.integers(0, 4),
    indexed=st.booleans(),
    data=st.data(),
)
def test_png_adam7_interlaced_roundtrip(
    w, h, channels, level, filter_seed, indexed, data
):
    """Adam7 (r13): the seven-pass layout must round-trip exactly over
    the dim × channel × level × filter space, including the indexed
    (palette) form — pass geometry, per-pass filter priors, empty-pass
    omission, and the de-interlace scatter are all load-bearing."""
    from kafka_streams_common_spark.operators.multimodal import (
        _AFFINE_GRAY_PALETTE,
    )

    if indexed and channels == 3:
        channels = 1
    n = w * h * channels
    px = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    ).reshape(h, w, channels)
    pay = _encode_png_bytes(
        px,
        level=level,
        filter_seed=filter_seed,
        palette=_AFFINE_GRAY_PALETTE if indexed else None,
        interlace=True,
    )
    assert pay[8 + 8 + 12] == 1  # IHDR interlace byte
    c, gw, gh, got = _parse_png(pay)
    assert (gw, gh) == (w, h)
    if indexed:
        assert c == 1
        assert np.array_equal(got[:, :, 0], (px[:, :, 0].astype(int) * 7 + 13) % 256)
    else:
        assert c == channels
        assert np.array_equal(got, px)
    # a corrupted Adam7 stream (one pass scanline short) is rejected
    # via the exact-size check — pin the message once per run
    if w >= 2 and h >= 2 and level == 0 and not indexed:
        import pytest
        import zlib

        from kafka_streams_common_spark.operators.multimodal import _png_chunk

        idat_at = pay.index(b"IDAT") - 4
        idat_len = int.from_bytes(pay[idat_at : idat_at + 4], "big")
        raw = zlib.decompress(pay[idat_at + 8 : idat_at + 8 + idat_len])
        bad = zlib.compress(raw[:-1])
        repacked = (
            pay[:idat_at] + _png_chunk(b"IDAT", bad) + pay[idat_at + 12 + idat_len :]
        )
        with pytest.raises(ValueError, match="Adam7 size"):
            _parse_png(repacked)


@given(
    w=dims,
    h=dims,
    channels=st.sampled_from([1, 2, 3, 4]),
    depth=st.sampled_from([8, 16]),
    level=st.sampled_from([0, 6]),
    filter_seed=st.integers(0, 4),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_alpha_and_deep_roundtrip(
    w, h, channels, depth, level, filter_seed, interlace, data
):
    """r14: the full channel × depth × interlace matrix round-trips
    exactly — gray / gray+alpha (type 4) / RGB / RGBA (type 6), 8- and
    16-bit, sequential and Adam7. The bytewise filters must use the
    byte-sized bpp offset (2/4/6/8), 16-bit samples must re-pair
    big-endian, and the de-interlace scatter must place multi-byte
    pixels intact."""
    alpha = channels in (2, 4)
    hi = (1 << depth) - 1
    n = w * h * channels
    px = np.array(
        data.draw(st.lists(st.integers(0, hi), min_size=n, max_size=n)),
        dtype=np.uint16 if depth == 16 else np.uint8,
    ).reshape(h, w, channels)
    pay = _encode_png_bytes(
        px,
        level=level,
        filter_seed=filter_seed,
        alpha=alpha,
        depth=depth,
        interlace=interlace,
    )
    # IHDR carries the declared depth and the right color type
    assert pay[8 + 8 + 8] == depth
    assert pay[8 + 8 + 9] == {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    c, gw, gh, got = _parse_png(pay)
    assert (c, gw, gh) == (channels, w, h)
    assert got.dtype == px.dtype
    assert np.array_equal(got, px)
