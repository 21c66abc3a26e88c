"""GIF87a codec tests: hand-computed known bytes (bit-level pin
independent of the encoder), LZW round-trips incl. the KwKwK case,
width bumps and the 4096-entry CLEAR reset, container framing, the
deterministic-size uncompressed framing, and the Spark-side dispatch."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kafka_streams_common_spark.operators.gif import (
    _encode_gif_bytes,
    _lzw_compress,
    _lzw_decompress,
    _parse_gif,
    encode_gif,
)


def test_known_bytes_uncompressed_2x1():
    """A 2×1 image with pixels [0, 255] in the CLEAR-per-pixel framing
    has a fully hand-computable code stream — 9-bit codes 256, 0, 256,
    255, 257 packed LSB-first are exactly 00 01 00 FC 17 10 — pinning
    the bit packer and the container layout against the spec by hand,
    independent of the decoder."""
    px = np.array([[[0], [255]]], dtype=np.uint8)  # h=1, w=2
    payload = _encode_gif_bytes(px, uncompressed=True)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    expected = (
        b"GIF87a"
        + b"\x02\x00\x01\x00\xf7\x00\x00"  # LSD: w=2 h=1, GCT 256, bg 0
        + palette
        + b"\x2c\x00\x00\x00\x00\x02\x00\x01\x00\x00"  # image descriptor
        + b"\x08"  # LZW min code size
        + b"\x06" + bytes([0x00, 0x01, 0x00, 0xFC, 0x17, 0x10]) + b"\x00"
        + b"\x3b"
    )
    assert payload == expected
    channels, w, h, got = _parse_gif(payload)
    assert (channels, w, h) == (1, 2, 1)
    assert got.reshape(-1).tolist() == [0, 255]


def test_lzw_roundtrip_kwkwk_and_repeats():
    """Runs like 'aaaaaa' force the decoder's code == next_code branch
    (the KwKwK case); cyclic md5-like rasters build long phrases."""
    for data in (b"aaaaaa", b"abababab", b"a", b"", bytes(range(256)) * 3,
                 (hashlib.md5(b"x").digest() * 17)[:200]):
        assert _lzw_decompress(_lzw_compress(data)) == data


def test_lzw_width_bumps_and_table_full_reset():
    """Random data with enough novel phrases crosses the 9→10→11→12 bit
    width bumps and the 4096-entry table cap (encoder emits CLEAR and
    resets; decoder must follow). Seeded — deterministic."""
    rng = np.random.RandomState(12345)
    data = rng.randint(0, 256, size=12000, dtype=np.int64).astype(np.uint8).tobytes()
    assert _lzw_decompress(_lzw_compress(data)) == data
    # and the compressed form is genuinely shorter on repetitive input
    rep = (hashlib.md5(b"rep").digest() * 64)[:1024]
    assert len(_lzw_compress(rep)) < len(rep)


def test_uncompressed_size_formula():
    """The CLEAR-per-pixel framing has arithmetic size: the format
    census oracle recomputes ``794 + d + ceil(d/255)`` with
    ``d = (18n+16)//8`` in SQL, so the encoder must hit it exactly."""
    for w, h in [(1, 1), (3, 5), (16, 16), (2, 7)]:
        px = (np.arange(w * h, dtype=np.int64) % 256).astype(np.uint8).reshape(h, w, 1)
        n = w * h
        d = (18 * n + 16) // 8
        want = 794 + d + (d + 254) // 255
        assert len(_encode_gif_bytes(px, uncompressed=True)) == want


def test_gif_roundtrip_both_framings():
    rng = np.random.RandomState(7)
    for trial in range(20):
        w = int(rng.randint(1, 17))
        h = int(rng.randint(1, 17))
        px = rng.randint(0, 256, size=(h, w, 1)).astype(np.uint8)
        for unc in (False, True):
            channels, gw, gh, got = _parse_gif(_encode_gif_bytes(px, uncompressed=unc))
            assert (channels, gw, gh) == (1, w, h)
            assert (got == px).all()


def test_gif89a_header_and_extension_blocks_are_skipped():
    """GIF89a payloads with extension blocks (e.g. comments) before the
    image descriptor must parse: extensions are label + sub-blocks."""
    px = np.array([[[7], [9], [11]]], dtype=np.uint8)
    payload = _encode_gif_bytes(px)
    # splice a comment extension right before the image descriptor
    desc_at = payload.index(b"\x2c", 13 + 768)
    ext = b"\x21\xfe" + b"\x05hello" + b"\x00"
    spliced = b"GIF89a" + payload[6:desc_at] + ext + payload[desc_at:]
    channels, w, h, got = _parse_gif(spliced)
    assert (channels, w, h) == (1, 3, 1)
    assert got.reshape(-1).tolist() == [7, 9, 11]


def test_gif_rejects_malformed():
    px = np.array([[[1]]], dtype=np.uint8)
    good = _encode_gif_bytes(px)
    with pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"JIF87a" + good[6:])
    with pytest.raises(ValueError, match="truncated image data"):
        _parse_gif(good[:-4])
    desc_at = good.index(b"\x2c", 13 + 768)
    # nonzero left/top offsets in the image descriptor are rejected
    # explicitly (same posture as interlace/local-palette), not decoded
    # silently as if anchored at (0, 0)
    for off_byte in (desc_at + 1, desc_at + 3):  # left lo, top lo
        bad = bytearray(good)
        bad[off_byte] = 2
        with pytest.raises(ValueError, match="offset image"):
            _parse_gif(bytes(bad))


def test_nongray_palette_maps_to_rgb():
    """A non-identity palette must come back as mapped RGB — palette
    lookup is part of the spec, not a pass-through."""
    px = np.array([[[0], [1]]], dtype=np.uint8)
    payload = bytearray(_encode_gif_bytes(px))
    # palette entry 1 → (10, 20, 30)
    payload[13 + 3 : 13 + 6] = bytes([10, 20, 30])
    channels, w, h, got = _parse_gif(bytes(payload))
    assert channels == 3 and (w, h) == (2, 1)
    assert got[0, 0].tolist() == [0, 0, 0]
    assert got[0, 1].tolist() == [10, 20, 30]


def test_encode_gif_spark_and_dispatch(spark):
    """``encode_gif`` emits md5-derived rasters that the shared image
    dispatch (``decode_image_features``) recognizes and decodes."""
    from kafka_streams_common_spark.operators.multimodal import decode_image_features

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta"), (3, "gamma!")], ["doc_id", "text"]
    )
    texts = {1: "alpha", 2: "beta beta", 3: "gamma!"}
    rows = {r["doc_id"]: r.asDict() for r in
            decode_image_features(encode_gif(docs)).collect()}
    for did, text in texts.items():
        hx = hashlib.md5(text.encode()).hexdigest()
        w = int(hx[:15], 16) % 16 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 16 + 1
        raster = (bytes.fromhex(hx) * 17)[: w * h]
        r = rows[did]
        assert r["format"] == "gif"
        assert (r["width"], r["height"]) == (w, h)
        assert r["min_px"] == min(raster) and r["max_px"] == max(raster)
        assert abs(r["mean_px"] - sum(raster) / len(raster)) < 1e-12


def test_gif_anim_roundtrip_order_delays_and_scope():
    """Animated GIF89a (r13): every frame round-trips through its own
    LZW stream in order; GCE delays attach to the frame they precede
    and DEFAULT to 0 when a frame has no GCE (a GCE governs only the
    next image, per spec); a descriptor whose pixel stream disagrees
    with its geometry is rejected; the NETSCAPE looping extension is
    skipped by framing."""
    from kafka_streams_common_spark.operators.gif import (
        _encode_gif_anim_bytes,
        _parse_gif_frames,
    )

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, size=(5, 7, 1)).astype(np.uint8) for _ in range(4)]
    delays = [2, 50, 7, 13]
    pay = _encode_gif_anim_bytes(frames, delays, loop=3)
    w, h, got_delays, got = _parse_gif_frames(pay)
    assert (w, h) == (7, 5)
    assert got_delays == delays
    assert len(got) == 4
    for want, have in zip(frames, got):
        assert (have == want[:, :, 0]).all()

    # a frame WITHOUT a GCE gets delay 0: splice out the second GCE
    # (8 bytes: 21 F9 04 <flags> <d0> <d1> <tci> 00)
    gce2_at = pay.index(b"\x21\xf9\x04", pay.index(b"\x21\xf9\x04") + 1)
    no_gce = pay[:gce2_at] + pay[gce2_at + 8 :]
    _, _, d2, f2 = _parse_gif_frames(no_gce)
    assert d2 == [2, 0, 7, 13] and len(f2) == 4

    # the still parser reads the FIRST frame of an animation
    from kafka_streams_common_spark.operators.gif import _parse_gif

    c, pw, ph, first = _parse_gif(pay)
    assert (c, pw, ph) == (1, 7, 5)
    assert (first[:, :, 0] == frames[0][:, :, 0]).all()

    # partial frames are COMPOSITED since r14 — but a descriptor that
    # lies about its geometry still fails the decoded-pixel-count check
    small = _encode_gif_anim_bytes(
        [np.zeros((5, 7, 1), dtype=np.uint8)], [1]
    )
    desc_at = small.index(b"\x2c", 13 + 768)
    bad = bytearray(small)
    bad[desc_at + 5] = 3  # frame width 3, but the stream carries 7x5 px
    with pytest.raises(ValueError, match="decoded .* pixels"):
        _parse_gif_frames(bytes(bad))
    # a genuine partial frame composites over the background canvas
    part = np.full((2, 3), 200, dtype=np.uint8)
    full = np.zeros((5, 7), dtype=np.uint8)
    full[1 : 1 + 2, 4 : 4 + 3] = part
    pay_p = _encode_gif_anim_bytes(
        [full[:, :, None], full[:, :, None]], [1, 2], composite=True
    )
    _, _, dp, fp = _parse_gif_frames(pay_p)
    assert dp == [1, 2] and (fp[0] == full).all() and (fp[1] == full).all()

    with pytest.raises(ValueError, match="at least one frame"):
        _encode_gif_anim_bytes([], [])


def test_gif_anim_spark_stats_match_reference(spark):
    """The Spark decode stage recovers frame order, delays, and stats
    identical to a pure-Python replay of the md5 arithmetic."""
    import hashlib

    from kafka_streams_common_spark.operators.gif import (
        decode_gif_anim_frame_stats,
        encode_gif_anim,
    )

    docs = spark.createDataFrame([(1, "alpha"), (2, "omega!")], ["doc_id", "text"])
    rows = sorted(
        (r["doc_id"], r["frame_idx"], r["delay_cs"], r["mean_luma"], r["diff_prev"])
        for r in decode_gif_anim_frame_stats(encode_gif_anim(docs)).collect()
    )
    want = []
    for did, text in ((1, "alpha"), (2, "omega!")):
        hx = hashlib.md5(text.encode()).hexdigest()
        d = bytes.fromhex(hx)
        w = int(hx[:15], 16) % 8 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 8 + 1
        nf = int(hashlib.md5((text + "|nf").encode()).hexdigest()[:15], 16) % 6 + 2
        raster = (d * 28)[: nf * w * h]
        prev = None
        for f in range(nf):
            fr = np.frombuffer(raster[f * w * h : (f + 1) * w * h], np.uint8)
            m = float(fr.astype(np.float64).mean())
            want.append(
                (did, f, d[f % 16] % 50 + 2, m, None if prev is None else abs(m - prev))
            )
            prev = m
    assert len(rows) == len(want)
    for got, exp in zip(rows, sorted(want)):
        assert got[0:3] == exp[0:3]
        assert abs(got[3] - exp[3]) < 1e-9
        if exp[4] is None:
            assert got[4] is None
        else:
            assert abs(got[4] - exp[4]) < 1e-9


def test_gif_row_interlacing_roundtrip_and_is_load_bearing():
    """Row interlacing (r13): the four-pass storage order must
    round-trip to the original raster for every height class (the pass
    boundaries shift with h); the de-interlace is load-bearing — a
    sequential stream with a LYING interlace flag decodes to permuted
    rows, not the original. Animated frames de-interlace too."""
    from kafka_streams_common_spark.operators.gif import (
        _encode_gif_anim_bytes,
        _gif_interlace_order,
        _parse_gif_frames,
    )

    rng = np.random.RandomState(4)
    for h in (1, 2, 3, 4, 5, 7, 8, 9, 16, 23):
        order = _gif_interlace_order(h)
        assert sorted(order) == list(range(h))  # a permutation of all rows
        px = rng.randint(0, 256, size=(h, 6, 1)).astype(np.uint8)
        c, w, gh, got = _parse_gif(_encode_gif_bytes(px, interlaced=True))
        assert (c, w, gh) == (1, 6, h)
        assert (got == px).all()
    # lying flag on a sequential stream permutes rows (h > 1)
    px = rng.randint(0, 256, size=(8, 4, 1)).astype(np.uint8)
    seq = bytearray(_encode_gif_bytes(px))
    seq[seq.index(b"\x2c", 13 + 768) + 9] |= 0x40
    got = _parse_gif(bytes(seq))[3]
    assert not (got == px).all()
    assert sorted(got.reshape(-1).tolist()) == sorted(px.reshape(-1).tolist())
    # interlaced frame inside an animation: splice the flag + reorder
    f0 = rng.randint(0, 256, size=(8, 4, 1)).astype(np.uint8)
    pay = _encode_gif_anim_bytes([f0], [3])
    # rebuild with the stored rows in pass order and the flag set
    stored = f0[_gif_interlace_order(8), :, :]
    inter = bytearray(_encode_gif_anim_bytes([stored], [3]))
    # first image descriptor sits after LSD + palette + NETSCAPE + GCE
    inter[inter.index(b"\x2c", 13 + 768) + 9] |= 0x40
    _, _, delays, frames = _parse_gif_frames(bytes(inter))
    assert delays == [3] and (frames[0] == f0[:, :, 0]).all()


def test_gif_composite_frames_roundtrip_offsets_local_palettes():
    """r14: diff-rect composite encoding — frame 0 full, later frames
    stored as their bounding diff rect at a nonzero (left, top), odd
    frames through a LOCAL affine color table, unchanged in-rect pixels
    as the transparent index — must decode to EXACTLY the rendered
    canvases."""
    from kafka_streams_common_spark.operators.gif import (
        _encode_gif_anim_bytes,
        _parse_gif_frames,
    )

    rng = np.random.RandomState(7)
    for trial in range(12):
        w = int(rng.randint(2, 10))
        h = int(rng.randint(2, 10))
        nf = int(rng.randint(2, 6))
        canvases = [rng.randint(0, 256, size=(h, w)).astype(np.uint8)]
        for f in range(1, nf):
            cv = canvases[-1].copy()
            y0 = int(rng.randint(0, h))
            x0 = int(rng.randint(0, w))
            rh = int(rng.randint(1, h - y0 + 1))
            rw = int(rng.randint(1, w - x0 + 1))
            cv[y0 : y0 + rh, x0 : x0 + rw] = rng.randint(
                0, 256, size=(rh, rw)
            ).astype(np.uint8)
            canvases.append(cv)
        delays = [int(rng.randint(2, 50)) for _ in range(nf)]
        pay = _encode_gif_anim_bytes(
            [c[:, :, None] for c in canvases], delays, composite=True
        )
        gw, gh, got_delays, frames = _parse_gif_frames(pay)
        assert (gw, gh) == (w, h)
        assert got_delays == delays
        assert len(frames) == nf
        for cv, fr in zip(canvases, frames):
            assert (fr == cv).all()


def test_gif_composite_container_uses_features():
    """The composite container genuinely exercises the three features:
    a nonzero-offset descriptor, a local color table, and a set
    transparency flag appear in the bytes when the content calls for
    them."""
    from kafka_streams_common_spark.operators.gif import (
        _encode_gif_anim_bytes,
        _parse_gif_frames,
    )

    base = np.zeros((6, 6), dtype=np.uint8)
    nxt = base.copy()
    nxt[3:5, 2:4] = 200  # only a sub-rect changes, away from (0, 0)
    pay = _encode_gif_anim_bytes(
        [base[:, :, None], nxt[:, :, None]], [2, 3], composite=True
    )
    # second descriptor: left=2, top=3, w=2, h=2, LOCAL table flag set
    i = pay.index(b"\x2c", 13 + 768)  # frame 0 descriptor
    j = pay.index(b"\x2c", i + 1)
    left = int.from_bytes(pay[j + 1 : j + 3], "little")
    top = int.from_bytes(pay[j + 3 : j + 5], "little")
    rw = int.from_bytes(pay[j + 5 : j + 7], "little")
    rh = int.from_bytes(pay[j + 7 : j + 9], "little")
    assert (left, top, rw, rh) == (2, 3, 2, 2)
    assert pay[j + 9] & 0x80  # local color table present (odd frame)
    _, _, _, frames = _parse_gif_frames(pay)
    assert (frames[1] == nxt).all()
    # transparency: make the rect contain an UNCHANGED pixel
    nxt2 = base.copy()
    nxt2[1, 1] = 9
    nxt2[3, 3] = 7  # bbox (1,1)-(3,3) includes unchanged pixels
    pay2 = _encode_gif_anim_bytes(
        [base[:, :, None], nxt2[:, :, None]], [2, 3], composite=True
    )
    # the second GCE has the transparent-color flag set (bit 0)
    g = pay2.index(b"\x21\xf9", 13 + 768)
    g2 = pay2.index(b"\x21\xf9", g + 1)
    assert pay2[g2 + 3] & 0x01
    _, _, _, frames2 = _parse_gif_frames(pay2)
    assert (frames2[1] == nxt2).all()


def test_gif_frames_rejects_disposal_2_3_and_bad_geometry():
    """Disposal modes 2/3 (restore-bg / restore-prev) stay explicitly
    rejected, as do rects that overflow the logical screen."""
    from kafka_streams_common_spark.operators.gif import (
        _encode_gif_anim_bytes,
        _parse_gif_frames,
    )

    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    pay = bytearray(_encode_gif_anim_bytes([px], [5]))
    g = pay.index(b"\x21\xf9", 13 + 768)
    pay[g + 3] = (pay[g + 3] & ~0x1C) | (2 << 2)  # disposal 2
    with pytest.raises(ValueError, match="disposal"):
        _parse_gif_frames(bytes(pay))
    pay[g + 3] = (pay[g + 3] & ~0x1C) | (3 << 2)  # disposal 3
    with pytest.raises(ValueError, match="disposal"):
        _parse_gif_frames(bytes(pay))
    # rect overflow: descriptor claims left=2 on a full-width frame
    pay2 = bytearray(_encode_gif_anim_bytes([px], [5]))
    d = pay2.index(b"\x2c", 13 + 768)
    pay2[d + 1] = 2
    with pytest.raises(ValueError, match="logical screen"):
        _parse_gif_frames(bytes(pay2))
