"""Baseline JPEG codec — the third REAL compressed-image branch.

Original implementation of the public baseline JPEG process (ITU-T
T.81 / ISO 10918-1): 8×8 block DCT, uniform quantization, zigzag,
DC-difference + run-length AC symbols, canonical Huffman entropy
coding with byte stuffing, and the SOI/DQT/SOF0/DHT/SOS/EOI marker
structure. Scope: 8-bit GRAYSCALE (one component, no chroma
subsampling), sequential baseline (SOF0), no restart intervals.

Design notes (honest about what is and is not pinned):

- The DECODER trusts nothing baked in: quantization and Huffman tables
  are parsed from the file's own DQT/DHT segments (canonical code
  generation per the spec's Annex C recipe), so it reads any
  conforming baseline grayscale JPEG, not just this encoder's output.
- The ENCODER writes CUSTOM canonical Huffman tables rather than the
  spec's example Annex K tables: all 12 DC size symbols at 4 bits and
  all 162 AC symbols at 8 bits (EOB first, so EOB = the all-zeros
  code). Flat tables are spec-valid (DHT carries them; every reader
  decodes from DHT), deterministic, immune to recalled-table typos,
  and make the entropy stream HAND-COMPUTABLE — tests pin the encoded
  bytes of a constant 8×8 image against bits worked out on paper.
  The cost is a few percent of compression vs tuned tables.
- JPEG is LOSSY, so unlike the PNG/GIF branches the decoded raster
  cannot be replayed bit-exactly in a SQL oracle. The registered query
  therefore gates the SQL-replayable invariants (recovered dims /
  pixel count) plus DETERMINISTIC reconstruction-error bounds measured
  against the known md5-derived source raster — the same
  invariant-gate pattern as the sketch rows (``agg_approx_*``); the
  codec's internals (DCT orthogonality, round-trips, marker handling,
  bit stuffing) are pinned in tests/test_jpeg.py.

Reference parity note: the reference engine (kafka-streams-common) has
no binary-decode surface; this tier is part of the mandated
training-data-pipeline extension, not a port.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# transform + tables

# 8×8 DCT-II basis matrix: C[u, x] = a(u)·cos((2x+1)uπ/16); orthonormal
# (C @ C.T = I, pinned in tests), so forward = C B Cᵀ, inverse = Cᵀ B C.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )

# Quantization: a mild uniform-ish table (flat 8 with a heavier
# high-frequency corner) rather than the spec's example luminance
# table — tables live in DQT, so any value set is conforming; a mild
# table keeps the reconstruction-error bound tight and DETERMINISTIC
# for the invariant gate. (u+v) ramp: Q[u,v] = 6 + u + v.
_QTABLE = (6 + np.add.outer(np.arange(8), np.arange(8))).astype(np.int64)

# zigzag scan order, generated per the spec's pattern (anti-diagonals,
# alternating direction: odd diagonals walk row-ascending) — generated,
# not typed, to rule out transcription slips.
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
)
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# Encoder Huffman tables (canonical; see module docstring). BITS[i] =
# number of codes of length i+1.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
# EOB first (code 0), then ZRL, then (run, size) in run-major order
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex-C canonical code assignment: symbols in HUFFVAL order get
    consecutive codes, code value doubling at each length step. Returns
    ``{symbol: (code, length)}``."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _bit_size(v: int) -> int:
    """JPEG amplitude size category: number of bits in |v|."""
    return int(abs(v)).bit_length()


class _BitWriterMSB:
    """MSB-first bit writer with JPEG byte stuffing (0xFF → 0xFF 0x00)
    and 1-padding of the final byte, per the spec."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _seg(marker: int, body: bytes) -> bytes:
    """One marker segment: FF xx + 2-byte big-endian length (incl. the
    length field itself) + body."""
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_body(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def _encode_jpeg_bytes(px: np.ndarray) -> bytes:
    """Encode an ``(h, w, 1)`` uint8 array as a baseline grayscale JPEG
    (SOI, DQT, SOF0, DHT×2, SOS, entropy-coded data, EOI). Blocks are
    edge-replicated to 8×8 multiples; the decoder crops back via the
    SOF0 dims."""
    h, w, channels = px.shape
    if channels != 1:
        raise ValueError("JPEG branch encodes 8-bit grayscale (1 channel) only")
    gray = px[:, :, 0]
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:h, :w] = gray
    padded[h:, :w] = gray[h - 1 : h, :]  # replicate bottom edge
    padded[:, w:] = padded[:, w - 1 : w]  # replicate right edge

    bw_writer = _BitWriterMSB()
    prev_dc = 0
    for br in range(0, bh, 8):
        for bc in range(0, bw, 8):
            block = padded[br : br + 8, bc : bc + 8] - 128.0
            coef = _C @ block @ _C.T
            q = np.rint(coef / _QTABLE).astype(np.int64)
            zz = q[_ZZ_ROWS, _ZZ_COLS]
            # DC: difference, size category, amplitude bits (one's
            # complement representation for negatives, per the spec)
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _bit_size(diff)
            code, length = _DC_CODES[size]
            bw_writer.put(code, length)
            if size:
                amp = diff if diff >= 0 else diff + (1 << size) - 1
                bw_writer.put(amp, size)
            # AC: run-length coded
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    zc, zl = _AC_CODES[0xF0]  # ZRL
                    bw_writer.put(zc, zl)
                    run -= 16
                size = _bit_size(v)
                code, length = _AC_CODES[(run << 4) | size]
                bw_writer.put(code, length)
                amp = v if v >= 0 else v + (1 << size) - 1
                bw_writer.put(amp, size)
                run = 0
            if run:
                ec, el = _AC_CODES[0x00]  # EOB
                bw_writer.put(ec, el)

    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(_QTABLE[r, c]) for r, c in _ZIGZAG))
    sof0 = _seg(
        0xC0,
        bytes([8])  # precision
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),  # 1 component: id 1, sampling 1x1, Tq 0
    )
    dht_dc = _seg(0xC4, _dht_body(0x00, _DC_BITS, _DC_VALS))
    dht_ac = _seg(0xC4, _dht_body(0x10, _AC_BITS, _AC_VALS))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8"  # SOI
        + dqt
        + sof0
        + dht_dc
        + dht_ac
        + sos
        + bw_writer.finish()
        + b"\xff\xd9"  # EOI
    )


class _BitReaderMSB:
    """MSB-first bit reader over entropy-coded data with byte
    unstuffing (0xFF 0x00 → 0xFF); stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream ran out of bytes")
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt != 0x00:
                raise ValueError(f"marker 0xFF{nxt:02x} inside entropy data")
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """``{(length, code): symbol}`` from a DHT table (canonical codes
    per Annex C) — the decode-side form of ``_canonical_codes``."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(rd: _BitReaderMSB, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (no symbol within 16 bits)")


def _extend(bits: int, size: int) -> int:
    """Amplitude decode per the spec: values with a 0 high bit are the
    one's-complement encodings of negatives."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _parse_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline grayscale JPEG per the public spec: marker
    walk (APPn/COM skipped), DQT/DHT parsed FROM THE FILE, SOF0
    geometry, SOS, then Huffman + dequant + IDCT block reconstruction
    with byte unstuffing. Progressive (SOF2), multi-component scans,
    and restart intervals are out of scope (rejected). Returns
    ``(channels, width, height, pixels)`` shaped ``(h, w, 1)`` — the
    ``_parse_netpbm`` contract."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload: {payload[:2]!r}")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    qsel = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI without a scan
            break
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02x}")
        if marker == 0xDB:  # DQT (possibly several tables)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int64)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(b[1:65], dtype=np.uint8)
                qtables[tq] = tbl
                b = b[65:]
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = body
            while b:
                tc_th = b[0]
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                htables[tc_th] = _huff_lookup(bits, vals)
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[0] != 8 or body[5] != 1:
                raise ValueError("8-bit single-component (grayscale) JPEG only")
            if body[7] != 0x11:
                raise ValueError("subsampled components not supported")
            qsel = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02x} not supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None or height is None:
                raise ValueError("SOS before SOF0")
            ncomp = body[0]
            if ncomp != 1:
                raise ValueError("multi-component scans not supported")
            dc_sel, ac_sel = body[2] >> 4, body[2] & 0x0F
            dc_tab = htables.get(0x00 | dc_sel)
            ac_tab = htables.get(0x10 | ac_sel)
            q = qtables.get(qsel)
            if dc_tab is None or ac_tab is None or q is None:
                raise ValueError("scan references missing DHT/DQT tables")
            rd = _BitReaderMSB(payload, pos + 2 + length)
            bh, bw = -(-height // 8), -(-width // 8)
            out = np.empty((bh * 8, bw * 8), dtype=np.float64)
            prev_dc = 0
            for br in range(bh):
                for bc in range(bw):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _read_symbol(rd, dc_tab)
                    prev_dc += _extend(rd.bits(size), size)
                    zz[0] = prev_dc
                    k = 1
                    while k < 64:
                        sym = _read_symbol(rd, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError(f"invalid AC symbol 0x{sym:02x}")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(rd.bits(size), size)
                        k += 1
                    coef = np.zeros((8, 8), dtype=np.float64)
                    coef[_ZZ_ROWS, _ZZ_COLS] = zz
                    block = _C.T @ (coef * q) @ _C + 128.0
                    out[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] = block
            px = np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.uint8)
            return 1, width, height, px.reshape(height, width, 1)
        # APPn / COM / anything else: skipped by the length field
        pos += 2 + length
    raise ValueError("no SOS scan before EOI")


# ---------------------------------------------------------------------------
# Spark surface

def encode_jpeg(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim_mod: int = 16,
) -> DataFrame:
    """Encode each document as a baseline grayscale JPEG — REAL DCT +
    quantization + canonical Huffman entropy coding. Geometry and
    source raster use the SAME md5 arithmetic as the other image
    encoders (``width = md5(text) % dim_mod + 1``, digest-cycled
    pixels), which is what lets the registered query bound the LOSSY
    reconstruction against a known source deterministically. Keeps the
    ``text`` column alongside the payload so the evaluation stage can
    recompute the source raster per row without a join. Arrow-batched
    ``mapInPandas``, map-only."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
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
                payloads.append(_encode_jpeg_bytes(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": payloads,
                    "text": pdf[text_col].values,
                },
                columns=["doc_id", "payload", "text"],
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


JPEG_RECON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("max_err_le_32", T.BooleanType(), True),
        T.StructField("mean_err_le_12", T.BooleanType(), True),
    ]
)


def decode_jpeg_recon_report(
    images: DataFrame, dim_mod: int = 16
) -> DataFrame:
    """Arrow-batched JPEG decode + reconstruction report over
    ``(doc_id, payload, text)``: parses the container (markers, DHT/DQT
    from the file, Huffman, dequant, IDCT), recomputes the md5-derived
    SOURCE raster from ``text``, and emits the recovered dims plus
    deterministic error-bound booleans (max |err| ≤ 32, mean |err| ≤ 12 —
    the (u+v)-ramp quantization table's measured worst case across the
    sf0.001/0.01/0.1 corpora is max 18 / mean 7.25 (md5 rasters are
    white noise, the hardest DCT content; tiny images dominate the
    mean), so the gates carry ~1.7× headroom while a broken
    unquant/IDCT/Huffman path lands at mean ≈50+). Dims and pixel
    count come from the SOF0 parse, NOT passed through."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p, text in zip(pdf["doc_id"], pdf["payload"], pdf["text"]):
                channels, w, h, px = _parse_jpeg(bytes(p))
                hx = hashlib.md5(text.encode()).hexdigest()
                raster = (bytes.fromhex(hx) * ((w * h + 15) // 16))[: w * h]
                src = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 1)
                err = np.abs(px.astype(np.int64) - src.astype(np.int64))
                rows.append(
                    {
                        "doc_id": did,
                        "format": "jpeg",
                        "width": w,
                        "height": h,
                        "n_px": w * h,
                        "max_err_le_32": bool(err.max() <= 32),
                        "mean_err_le_12": bool(err.mean() <= 12.0),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in JPEG_RECON_SCHEMA])

    return images.mapInPandas(batches, JPEG_RECON_SCHEMA)
