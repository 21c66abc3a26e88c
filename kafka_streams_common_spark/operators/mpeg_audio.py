"""MPEG-audio (MP3) metadata scan: MPEG-1 Layer III frame-header walk
(the public ISO/IEC 11172-3 header layout) plus the ID3v1 trailing tag
(the public id3.org v1 layout) — the header-level census an audio lake
needs BEFORE committing to a full decode: bitrate/samplerate/channel
recovery, CBR duration arithmetic, and tag metadata extraction, all
without touching the audio payload.

This is deliberately a METADATA operator, not a decoder: MDCT synthesis
is out of scope (the container has no audio codec library — the same
honesty posture as the JPEG tier's from-scratch note), but everything a
frame-header walk can recover is recovered and VERIFIED — sync words,
version/layer fields, bitrate and samplerate table indexes, per-frame
padding arithmetic (frame length = ``144000·kbps/Hz + pad``), CBR
consistency across frames, and the 128-byte ``TAG`` trailer's fixed
field offsets.

Reference parity note: the reference engine (kafka-streams-common) has
no audio surface — this module is part of the mandated
training-data-pipeline extension, not a port.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free-format
# and 15 = reserved are both rejected)
MPEG1_L3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)

# MPEG-1 samplerate table, Hz, index 0..2 (3 = reserved)
MPEG1_SAMPLERATES = (44100, 48000, 32000)

CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")

SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III

ID3V1_SIZE = 128


def _mp3_frame_header(
    bitrate_idx: int, sr_idx: int, channel_mode: int, padded: bool
) -> bytes:
    """One 4-byte MPEG-1 Layer III frame header: 11 sync bits, version
    11 (MPEG-1), layer 01 (III), protection 1 (no CRC), then the
    bitrate/samplerate/padding/mode fields at their spec offsets."""
    b1 = 0xFF
    b2 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 0b1  # sync + MPEG1 + LayerIII + no-CRC
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (int(padded) << 1)
    b4 = channel_mode << 6  # mode ext / copyright / original / emphasis all 0
    return bytes((b1, b2, b3, b4))


def _mp3_frame_len(bitrate_idx: int, sr_idx: int, padded: bool) -> int:
    """Layer III frame length in bytes:
    ``floor(144 * bitrate / samplerate) + padding`` per the spec."""
    return (
        144 * MPEG1_L3_BITRATES[bitrate_idx] * 1000 // MPEG1_SAMPLERATES[sr_idx]
        + int(padded)
    )


def _id3v1_tag(
    title: str, artist: str, album: str, year: int, comment: str, genre: int
) -> bytes:
    """The 128-byte ID3v1 trailer: ``TAG`` magic then fixed-width
    NUL-padded Latin-1 fields at the public layout's offsets."""

    def field(s: str, n: int) -> bytes:
        b = s.encode("latin-1")[:n]
        return b + b"\x00" * (n - len(b))

    return (
        b"TAG"
        + field(title, 30)
        + field(artist, 30)
        + field(album, 30)
        + field(f"{year:04d}", 4)
        + field(comment, 30)
        + bytes([genre])
    )


def _mp3_bytes(
    n_frames: int,
    bitrate_idx: int,
    sr_idx: int,
    channel_mode: int,
    fill: bytes,
    title: str,
    artist: str,
    album: str,
    year: int,
    genre: int,
) -> bytes:
    """A complete CBR MPEG-1 Layer III file: ``n_frames`` frames whose
    PADDING BIT alternates (so the walker's per-frame length arithmetic
    is load-bearing), deterministic fill bytes as the audio payload,
    then the ID3v1 trailer."""
    out = bytearray()
    for i in range(n_frames):
        padded = i % 2 == 0
        flen = _mp3_frame_len(bitrate_idx, sr_idx, padded)
        body = (fill * ((flen - 4) // len(fill) + 1))[: flen - 4]
        out += _mp3_frame_header(bitrate_idx, sr_idx, channel_mode, padded) + body
    out += _id3v1_tag(title, artist, album, year, "", genre)
    return bytes(out)


def _parse_mp3_meta(payload: bytes) -> dict:
    """Walk an MPEG-1 Layer III file: per frame VERIFY the sync word,
    version and layer fields, and table indexes (free-format, reserved
    bitrate/samplerate indexes, and CRC-protected frames are explicitly
    rejected — the tier's posture), advance by the computed frame
    length, require CBR consistency (one bitrate/samplerate/mode across
    every frame), then parse the 128-byte ID3v1 trailer at its fixed
    offsets. Everything returned is RECOVERED from the bytes."""
    n_frames = 0
    bitrate_idx = sr_idx = mode = None
    pos = 0
    while pos < len(payload) - ID3V1_SIZE:
        if pos + 4 > len(payload):
            raise ValueError(f"truncated frame header at offset {pos}")
        b1, b2, b3, b4 = payload[pos : pos + 4]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            raise ValueError(f"lost MPEG sync at offset {pos}")
        if (b2 >> 3) & 0b11 != 0b11:
            raise ValueError("only MPEG-1 audio is supported")
        if (b2 >> 1) & 0b11 != 0b01:
            raise ValueError("only Layer III is supported")
        if not b2 & 1:
            raise ValueError("CRC-protected frames are not supported")
        bidx = b3 >> 4
        if bidx in (0, 15):
            raise ValueError(f"free-format/reserved bitrate index {bidx}")
        sidx = (b3 >> 2) & 0b11
        if sidx == 3:
            raise ValueError("reserved samplerate index")
        m = b4 >> 6
        if n_frames == 0:
            bitrate_idx, sr_idx, mode = bidx, sidx, m
        elif (bidx, sidx, m) != (bitrate_idx, sr_idx, mode):
            raise ValueError(f"VBR/mode change at frame {n_frames} not supported")
        flen = _mp3_frame_len(bidx, sidx, bool((b3 >> 1) & 1))
        if pos + flen > len(payload) - ID3V1_SIZE:
            raise ValueError(f"truncated frame {n_frames}")
        pos += flen
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MPEG audio frames")
    tag = payload[pos:]
    if len(tag) != ID3V1_SIZE or tag[:3] != b"TAG":
        raise ValueError("missing ID3v1 trailer")
    sr = MPEG1_SAMPLERATES[sr_idx]
    return {
        "n_frames": n_frames,
        "bitrate_kbps": MPEG1_L3_BITRATES[bitrate_idx],
        "sample_rate": sr,
        "channel_mode": CHANNEL_MODES[mode],
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sr,
        "title": tag[3:33].rstrip(b"\x00").decode("latin-1"),
        "artist": tag[33:63].rstrip(b"\x00").decode("latin-1"),
        "album": tag[63:93].rstrip(b"\x00").decode("latin-1"),
        "year": int(tag[93:97]),
        "genre_id": tag[127],
    }


# ---------------------------------------------------------------------------
# Spark surface


def encode_mp3_meta(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encode each document as a genuine CBR MPEG-1 Layer III file with
    an ID3v1 trailer, every recoverable field derived from the corpus
    so the SQL oracle replays it: bitrate index ``doc_id % 14 + 1``,
    samplerate index ``doc_id % 3``, channel mode ``doc_id % 4``,
    ``strlen(text) % 8 + 2`` frames (padding bit alternating per
    frame), title/artist = the text digests, year ``1980 + doc_id %
    40``, genre ``doc_id % 80``. Audio payload is digest fill — the
    metadata walk never reads it. Arrow-batched ``mapInPandas``,
    map-only."""
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
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                hx = hashlib.md5(text.encode()).hexdigest()
                rhx = hashlib.md5(text[::-1].encode()).hexdigest()
                payloads.append(
                    _mp3_bytes(
                        n_frames=len(text.encode()) % 8 + 2,
                        bitrate_idx=did % 14 + 1,
                        sr_idx=did % 3,
                        channel_mode=did % 4,
                        fill=bytes.fromhex(hx),
                        title=hx[:30],
                        artist=rhx[:30],
                        album="corpus",
                        year=1980 + did % 40,
                        genre=did % 80,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "payload": payloads},
                columns=["doc_id", "payload"],
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channel_mode", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("genre_id", T.IntegerType(), True),
    ]
)


def decode_mp3_meta(files: DataFrame) -> DataFrame:
    """Arrow-batched MP3 metadata scan over ``(doc_id, payload)``: the
    full frame-header walk + ID3v1 parse of ``_parse_mp3_meta`` per
    row. Every output column is RECOVERED from the bytes (frame count
    by walking, bitrate/samplerate/mode from header fields, duration
    from the CBR arithmetic, tag fields from their fixed offsets) — a
    wrong frame-length formula desyncs the walk and fails loudly
    rather than mis-counting. Map-only, no shuffle — the audio-lake
    census shape at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                meta = _parse_mp3_meta(bytes(p))
                rows.append({"doc_id": did, **meta})
            yield pd.DataFrame(rows, columns=[f.name for f in MP3_META_SCHEMA])

    return files.mapInPandas(batches, MP3_META_SCHEMA)
