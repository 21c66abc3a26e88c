"""GIF87a codec — the second REAL compressed-image branch (after PNG).

Original implementation of the public GIF87a specification (CompuServe,
1987; the LZW variant is the GIF flavor: variable-width codes packed
LSB-first, CLEAR/EOI control codes, 12-bit table cap): header + logical
screen descriptor + global color table + image descriptor + LZW-coded
index stream in ≤255-byte sub-blocks + trailer. Scope mirrors the PNG
branch (``operators/multimodal._parse_png``): 8-bit indexed pixels over
a grayscale identity palette, non-interlaced, single image frame.

Two encode framings, exactly like PNG's ``level=0`` vs ``level=6``:

- ``uncompressed=True`` — the classic "uncompressed GIF" technique: a
  CLEAR code before every pixel code keeps the dictionary empty and the
  code width pinned at 9 bits, so the container's byte length is pure
  arithmetic (``794 + d + ceil(d/255)`` with ``d = (18n+16)//8`` for
  ``n`` pixels) and a SQL oracle can recompute it — the format-census
  leg.
- ``uncompressed=False`` — REAL greedy LZW with dictionary growth,
  variable code widths (9→12 bits) and table-full CLEAR resets; the
  md5-cycled rasters repeat with period 16, so phrases genuinely grow
  and the stream genuinely compresses — the content-decode leg.

The decoder handles both (they are the same spec), plus GIF89a headers
and extension blocks, and is exercised by: a hand-built known-bytes GIF
(bit-level unpacking pinned independently of the encoder), hypothesis
round-trips over the filter/dim space, and a >4096-entry stream that
forces the table-full CLEAR reset (tests/test_gif.py).

Reference parity note: the reference engine (kafka-streams-common) has
no binary-decode surface at all — this tier is part of the mandated
training-data-pipeline extension, not a port.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MCS = 8  # minimum LZW code size for 8-bit indexed pixels
_CLEAR = 1 << _MCS  # 256
_EOI = _CLEAR + 1  # 257
_FIRST = _EOI + 1  # 258
_MAX_CODE = 4096  # 12-bit table cap per the spec


class _BitPacker:
    """LSB-first variable-width code packer (the GIF bit order: the
    first code occupies the low bits of the first byte)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_compress(data: bytes, uncompressed: bool = False) -> bytes:
    """GIF-flavor LZW over 8-bit symbols → packed code bytes.

    Greedy longest-match with the GIF sync rules: the code WIDTH bumps
    after the encoder defines entry ``(1 << width) - 1`` — i.e. when
    ``next_code == (1 << width) + 1`` — because the decoder defines each
    entry one code later than the encoder; at 4096 entries a CLEAR is
    emitted and the dictionary resets. ``uncompressed=True`` emits a
    CLEAR before every pixel so no entry is ever defined and the width
    stays ``_MCS + 1`` (deterministic output length: ``2n+1`` 9-bit
    codes for ``n`` symbols)."""
    pk = _BitPacker()
    if not data:
        pk.put(_CLEAR, _MCS + 1)
        pk.put(_EOI, _MCS + 1)
        return pk.finish()
    if uncompressed:
        pk.put(_CLEAR, _MCS + 1)
        for i, sym in enumerate(data):
            if i:
                pk.put(_CLEAR, _MCS + 1)
            pk.put(sym, _MCS + 1)
        pk.put(_EOI, _MCS + 1)
        return pk.finish()
    table: dict[bytes, int] = {}
    next_code = _FIRST
    width = _MCS + 1
    pk.put(_CLEAR, width)
    w = data[0:1]
    for i in range(1, len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w = w + c
            continue
        pk.put(table[w] if len(w) > 1 else w[0], width)
        if next_code < _MAX_CODE:
            table[w + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            pk.put(_CLEAR, width)
            table.clear()
            next_code = _FIRST
            width = _MCS + 1
        w = c
    pk.put(table[w] if len(w) > 1 else w[0], width)
    pk.put(_EOI, width)
    return pk.finish()


def _lzw_decompress(codebytes: bytes, expected: int | None = None) -> bytes:
    """Inverse of ``_lzw_compress`` per the spec: LSB-first unpacking,
    CLEAR resets, the KwKwK case (``code == next_code``), width bump
    when the table reaches ``1 << width`` entries, no growth past 4096.
    ``expected`` (the pixel count from the image descriptor) lets the
    stream stop cleanly even if EOI is missing."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = _MCS + 1
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(codebytes):
                if expected is not None and len(out) >= expected:
                    return bytes(out)
                raise ValueError("LZW stream ended without EOI")
            acc |= codebytes[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = table[:_FIRST]
            width = _MCS + 1
            prev = None
            continue
        if code == _EOI:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[0:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range (table={len(table)})")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[0:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    raise AssertionError("unreachable")


def _subblocks(data: bytes) -> bytes:
    """Split a byte stream into GIF data sub-blocks (length-prefixed,
    ≤255 bytes each) with the zero-length terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    return bytes(out)


_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def _gif_interlace_order(h: int) -> list[int]:
    """The GIF four-pass row interlacement per the spec: rows 0,8,16…,
    then 4,12…, then 2,6,10…, then the odd rows — the order rows are
    STORED in the stream."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _encode_gif_bytes(
    px: np.ndarray, uncompressed: bool = False, interlaced: bool = False
) -> bytes:
    """Encode an ``(h, w, 1)`` uint8 array as a spec-compliant GIF87a:
    header, logical screen descriptor (global color table flag set,
    8-bit color resolution, 256-entry table), grayscale identity
    palette, image descriptor at (0,0), LZW-coded index stream in
    sub-blocks, trailer. ``interlaced`` (r13) stores the rows in the
    spec's four-pass order with the descriptor's interlace flag set —
    same pixels, so content oracles are unchanged while the decoder
    must run the row de-interlace."""
    h, w, channels = px.shape
    if channels != 1:
        raise ValueError("GIF branch encodes 8-bit grayscale (1 channel) only")
    lsd = (
        w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0xF7, 0x00, 0x00])  # GCT present, 8-bit res, 256 entries
    )
    desc = (
        b"\x2c"
        + (0).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + (b"\x40" if interlaced else b"\x00")  # no local table; interlace flag
    )
    raster = px[:, :, 0]
    if interlaced:
        raster = raster[_gif_interlace_order(h)]
    codes = _lzw_compress(raster.reshape(-1).tobytes(), uncompressed=uncompressed)
    return (
        b"GIF87a"
        + lsd
        + _GRAY_PALETTE
        + desc
        + bytes([_MCS])
        + _subblocks(codes)
        + b"\x3b"
    )


def _parse_gif(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a GIF87a/89a container per the public spec: header,
    logical screen descriptor, global color table, block walk (image
    descriptors, 0x21 extensions skipped by sub-block framing, 0x3B
    trailer), LZW-decode of the first image's index stream, palette
    lookup. Returns ``(channels, width, height, pixels)`` shaped
    ``(h, w, channels)`` — the ``_parse_netpbm`` contract. A grayscale
    identity palette yields 1 channel; any other palette yields the
    mapped RGB (3 channels). Interlaced images and local color tables
    are out of scope (rejected), like interlaced PNGs."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        gct_len = 3 * (2 << (flags & 0x07))
        palette = np.frombuffer(payload[pos : pos + gct_len], dtype=np.uint8)
        if palette.size != gct_len:
            raise ValueError("truncated global color table")
        palette = palette.reshape(-1, 3)
        pos += gct_len
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
        if pos + 10 > len(payload):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        if left or top:
            # explicit-rejection posture, same as interlace / local palettes:
            # a conforming foreign GIF offset within the logical screen would
            # otherwise decode silently as if anchored at (0, 0)
            raise ValueError(f"offset image descriptors not supported ({left},{top})")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        iflags = payload[pos + 9]
        if iflags & 0x80:
            raise ValueError("local color tables not supported")
        interlaced = bool(iflags & 0x40)
        pos += 10
        mcs = payload[pos]
        if mcs != _MCS:
            raise ValueError(f"unsupported LZW min code size {mcs} (8-bit only)")
        pos += 1
        parts = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("truncated image data sub-block")
            parts += chunk
            pos += 1 + ln
        if pos >= len(payload):
            raise ValueError("missing sub-block terminator")
        pos += 1
        idx = np.frombuffer(
            _lzw_decompress(bytes(parts), expected=w * h), dtype=np.uint8
        )
        if idx.size != w * h:
            raise ValueError(f"decoded {idx.size} pixels, descriptor says {w * h}")
        if interlaced:  # rows arrive in the four-pass order (r13)
            stored = idx.reshape(h, w)
            img = np.empty_like(stored)
            img[_gif_interlace_order(h)] = stored
            idx = img.reshape(-1)
        if palette is None:
            raise ValueError("no global color table (indexed pixels need one)")
        rgb = palette[idx]  # (n, 3)
        if (rgb[:, 0] == rgb[:, 1]).all() and (rgb[:, 1] == rgb[:, 2]).all():
            return 1, w, h, rgb[:, 0].reshape(h, w, 1)
        return 3, w, h, rgb.reshape(h, w, 3)
    raise ValueError("no image descriptor before trailer")


def _encode_gif_anim_bytes(
    frames: list[np.ndarray], delays_cs: list[int], loop: int = 0
) -> bytes:
    """Encode a list of same-size ``(h, w, 1)`` uint8 frames as an
    ANIMATED GIF89a (r13): header, logical screen descriptor, grayscale
    identity palette, the NETSCAPE2.0 looping application extension,
    then per frame a Graphic Control Extension (disposal 1 = do not
    dispose, no transparency, delay in centiseconds) + full-frame image
    descriptor at (0,0) + its own REAL LZW code stream, and the
    trailer. Full-frame replace only — the same scope posture as the
    still branch (no offsets/partial frames/interlace/local tables)."""
    if not frames:
        raise ValueError("animated GIF needs at least one frame")
    h, w, channels = frames[0].shape
    if channels != 1:
        raise ValueError("GIF branch encodes 8-bit grayscale (1 channel) only")
    if len(delays_cs) != len(frames):
        raise ValueError("one delay per frame")
    lsd = (
        w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0xF7, 0x00, 0x00])
    )
    netscape = (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        + int(loop).to_bytes(2, "little")
        + b"\x00"
    )
    body = bytearray()
    for px, delay in zip(frames, delays_cs):
        if px.shape != (h, w, 1):
            raise ValueError("all frames must share the logical screen size")
        gce = (
            b"\x21\xf9\x04\x04"  # disposal 1, no transparent color
            + int(delay).to_bytes(2, "little")
            + b"\x00\x00"
        )
        desc = (
            b"\x2c"
            + (0).to_bytes(2, "little")
            + (0).to_bytes(2, "little")
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\x00"
        )
        codes = _lzw_compress(px.reshape(-1).tobytes())
        body += gce + desc + bytes([_MCS]) + _subblocks(codes)
    return b"GIF89a" + lsd + _GRAY_PALETTE + netscape + bytes(body) + b"\x3b"


def _parse_gif_frames(
    payload: bytes,
) -> tuple[int, int, list[int], list[np.ndarray]]:
    """Parse an animated (or single-frame) GIF into ALL of its frames:
    same container walk as ``_parse_gif`` but collecting every image
    descriptor, with the Graphic Control Extension's delay field
    (centiseconds) attached to the frame it precedes (0 when absent,
    per the spec's default). Scope: full-frame replace over the
    grayscale identity palette (the animated twin of the still
    branch's posture) — offsets, partial frames, interlace, local
    tables, and non-gray palettes are rejected. Other extensions
    (NETSCAPE looping, comments) are skipped by sub-block framing.
    Returns ``(width, height, delays_cs, frames)`` with each frame the
    ``(h, w)`` luma plane."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        gct_len = 3 * (2 << (flags & 0x07))
        palette = np.frombuffer(payload[pos : pos + gct_len], dtype=np.uint8)
        if palette.size != gct_len:
            raise ValueError("truncated global color table")
        palette = palette.reshape(-1, 3)
        pos += gct_len
    if palette is None:
        raise ValueError("no global color table (indexed pixels need one)")
    if not (
        (palette[:, 0] == palette[:, 1]).all()
        and (palette[:, 1] == palette[:, 2]).all()
    ):
        raise ValueError("animated branch supports grayscale palettes only")
    lut = palette[:, 0]
    delays: list[int] = []
    frames: list[np.ndarray] = []
    pending_delay = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else None
            body = bytearray()
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                body += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                if len(body) < 4:
                    raise ValueError("truncated graphic control extension")
                pending_delay = int.from_bytes(body[1:3], "little")
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
        if pos + 10 > len(payload):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        if left or top:
            raise ValueError(f"offset image descriptors not supported ({left},{top})")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        if (w, h) != (sw, sh):
            raise ValueError("partial frames not supported (full-frame replace only)")
        iflags = payload[pos + 9]
        if iflags & 0x80:
            raise ValueError("local color tables not supported")
        interlaced = bool(iflags & 0x40)
        pos += 10
        mcs = payload[pos]
        if mcs != _MCS:
            raise ValueError(f"unsupported LZW min code size {mcs} (8-bit only)")
        pos += 1
        parts = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                raise ValueError("truncated image data sub-block")
            parts += chunk
            pos += 1 + ln
        if pos >= len(payload):
            raise ValueError("missing sub-block terminator")
        pos += 1
        idx = np.frombuffer(
            _lzw_decompress(bytes(parts), expected=w * h), dtype=np.uint8
        )
        if idx.size != w * h:
            raise ValueError(f"decoded {idx.size} pixels, descriptor says {w * h}")
        frame = lut[idx].reshape(h, w)
        if interlaced:  # per-frame row de-interlace (r13)
            img = np.empty_like(frame)
            img[_gif_interlace_order(h)] = frame
            frame = img
        frames.append(frame)
        delays.append(pending_delay)
        pending_delay = 0  # a GCE governs only the next image, per spec
    if not frames:
        raise ValueError("no image descriptor before trailer")
    return sw, sh, delays, frames


def encode_gif(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim_mod: int = 16,
    uncompressed: bool = False,
    interlaced: bool = False,
) -> DataFrame:
    """Encode each document as a genuine GIF87a — REAL variable-width
    LZW (or the deterministic-size CLEAR-per-pixel framing when
    ``uncompressed=True``), 8-bit grayscale over the identity palette.
    Geometry and raster use the SAME md5 arithmetic as ``encode_pgm`` /
    ``encode_png`` (``width = md5(text) % dim_mod + 1``, digest-cycled
    pixels), so a SQL oracle replays the DECODED content without
    replaying LZW — and because the raster repeats with period 16, the
    dictionary builds real multi-byte phrases (genuine compression,
    not a degenerate stream). Arrow-batched ``mapInPandas``, map-only,
    same 100 TB shape as ``encode_png``."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                hx = hashlib.md5(text.encode()).hexdigest()
                w = int(hx[:15], 16) % dim_mod + 1
                h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % dim_mod + 1
                raster = (bytes.fromhex(hx) * ((w * h + 15) // 16))[: w * h]
                px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 1)
                payloads.append(
                    _encode_gif_bytes(
                        px, uncompressed=uncompressed, interlaced=interlaced
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "payload": payloads},
                columns=["doc_id", "payload"],
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


def encode_gif_anim(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encode each document as an ANIMATED GIF89a clip with the SAME
    geometry arithmetic as ``encode_y4m`` (``w/h = md5 % 8 + 1``,
    ``n_frames = md5(text||'|nf') % 6 + 2``, frame ``f``'s raster =
    digest bytes cycled continuously across the clip), plus a per-frame
    GCE delay ``digest_byte[f % 16] % 50 + 2`` centiseconds — all
    md5-derived, so a SQL oracle replays frame content, frame ORDER,
    and the delays without replaying LZW. Arrow-batched
    ``mapInPandas``, map-only."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                hx = hashlib.md5(text.encode()).hexdigest()
                d = bytes.fromhex(hx)
                w = int(hx[:15], 16) % 8 + 1
                h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 8 + 1
                nf = int(hashlib.md5((text + "|nf").encode()).hexdigest()[:15], 16) % 6 + 2
                raster = (d * 28)[: nf * w * h]
                frames = [
                    np.frombuffer(
                        raster[f * w * h : (f + 1) * w * h], dtype=np.uint8
                    ).reshape(h, w, 1)
                    for f in range(nf)
                ]
                delays = [d[f % 16] % 50 + 2 for f in range(nf)]
                payloads.append(_encode_gif_anim_bytes(frames, delays))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "payload": payloads},
                columns=["doc_id", "payload"],
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


GIF_ANIM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("delay_cs", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("min_luma", T.LongType(), True),
        T.StructField("max_luma", T.LongType(), True),
        T.StructField("diff_prev", T.DoubleType(), True),
    ]
)


def decode_gif_anim_frame_stats(gifs: DataFrame) -> DataFrame:
    """Arrow-batched animated-GIF decode over ``(doc_id, payload)``:
    walk the container (header, palette, NETSCAPE/GCE extensions,
    per-frame image blocks), LZW-decode EVERY frame, and emit per-frame
    luma stats + the GCE delay + the mean-luma delta vs the previous
    frame — the GIF twin of ``decode_y4m_frame_stats`` (scene-change
    primitive). Frame segmentation and ORDER are recovered from the
    container walk, never passed through; a zero-frame batch still
    carries the schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, delays, frames = _parse_gif_frames(bytes(p))
                prev = None
                for fi, (fr, delay) in enumerate(zip(frames, delays)):
                    m = float(fr.astype(np.float64).mean())
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_idx": fi,
                            "width": w,
                            "height": h,
                            "delay_cs": delay,
                            "mean_luma": m,
                            "min_luma": int(fr.min()),
                            "max_luma": int(fr.max()),
                            "diff_prev": None if prev is None else abs(m - prev),
                        }
                    )
                    prev = m
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_ANIM_STATS_SCHEMA]
            )

    return gifs.mapInPandas(batches, GIF_ANIM_STATS_SCHEMA)
