"""Ogg container + Vorbis header metadata (r14) — the streaming-audio
container of the open-codec world, from the PUBLIC specs (RFC 3533 for
the Ogg page layout; xiph.org Vorbis I spec for the header packets).

Implemented, with every integrity field real and VERIFIED:

- Ogg pages: ``OggS`` capture pattern, version 0, header-type flags
  (BOS 0x02 / EOS 0x04), 64-bit little-endian granule position, stream
  serial, page sequence numbers (gaps rejected), the page CRC —
  computed FROM SCRATCH with the Ogg polynomial 0x04c11db7
  (non-reflected, init 0, no final xor — deliberately NOT zlib's CRC,
  so a borrowed CRC-32 fails instantly), and the segment/lacing table,
  including packets SPANNING multiple 255-byte segments;
- Vorbis identification header (packet type 1): version 0, channel
  count, 32-bit little-endian sample rate, bitrate triple, blocksize
  nibbles, framing bit;
- Vorbis comment header (packet type 3): the same little-endian
  key=value layout as FLAC's VORBIS_COMMENT (the block FLAC imported
  from Vorbis), plus the framing bit the FLAC variant omits.

The fixture is a 3-page logical stream per document (BOS page carrying
the ID header, a comment page whose packet deliberately exceeds 255
bytes so the lacing walk is multi-segment, and an EOS page whose
granule position is the total sample count); all recovered fields
derive from the documents table's md5 arithmetic so the SQL oracle
replays them. Encode/decode are map-only Arrow ``mapInPandas`` stages.

Reference parity note: the reference engine has no audio surface; this
module is part of the mandated multimodal extension tier.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OGG_MAGIC = b"OggS"
_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)

# The Ogg CRC table: polynomial 0x04c11db7, NON-reflected, init 0, no
# final xor (RFC 3533 appendix) — distinct from zlib's reflected CRC-32.
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def build_page(
    packet: bytes,
    serial: int,
    seq: int,
    granule: int,
    bos: bool = False,
    eos: bool = False,
) -> bytes:
    """One Ogg page holding one whole packet: lacing = 255-valued
    segments plus the final short segment (a packet of exact multiple
    of 255 gets a trailing 0 lacing value, per spec)."""
    lacing = [255] * (len(packet) // 255)
    lacing.append(len(packet) % 255)
    if len(lacing) > 255:
        raise ValueError("packet too large for one page")
    header_type = (0x02 if bos else 0) | (0x04 if eos else 0)
    head = (
        OGG_MAGIC
        + b"\x00"
        + bytes([header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = head + packet
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def parse_pages(data: bytes) -> list[dict]:
    """Walk a physical stream: capture pattern, version, CRC (recomputed
    with the field zeroed), contiguous sequence numbers, BOS-first /
    EOS-last all VERIFIED. Returns per-page dicts with the reassembled
    packet bytes (multi-segment lacing honored)."""
    pages = []
    pos = 0
    expect_seq: int | None = None
    while pos < len(data):
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        if data[pos : pos + 4] != OGG_MAGIC:
            raise ValueError(f"lost Ogg capture pattern at {pos}")
        if data[pos + 4] != 0:
            raise ValueError(f"unsupported Ogg version {data[pos + 4]}")
        header_type = data[pos + 5]
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little", signed=True)
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(data[pos + 18 : pos + 22], "little")
        want_crc = int.from_bytes(data[pos + 22 : pos + 26], "little")
        n_segs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + n_segs]
        body_at = pos + 27 + n_segs
        body_len = sum(lacing)
        page_end = body_at + body_len
        if page_end > len(data):
            raise ValueError("Ogg page overruns stream")
        zeroed = data[pos : pos + 22] + b"\x00\x00\x00\x00" + data[pos + 26 : page_end]
        if ogg_crc(zeroed) != want_crc:
            raise ValueError(f"Ogg page CRC mismatch on page seq {seq}")
        if expect_seq is not None and seq != expect_seq:
            raise ValueError(f"page sequence gap: {expect_seq} -> {seq}")
        expect_seq = seq + 1
        if not pages and not header_type & 0x02:
            raise ValueError("first page is not BOS")
        pages.append(
            {
                "granule": granule,
                "serial": serial,
                "seq": seq,
                "bos": bool(header_type & 0x02),
                "eos": bool(header_type & 0x04),
                "packet": data[body_at:page_end],
                "n_segments": n_segs,
            }
        )
        pos = page_end
    if not pages:
        raise ValueError("empty Ogg stream")
    if not pages[-1]["eos"]:
        raise ValueError("last page is not EOS")
    return pages


def vorbis_id_packet(channels: int, sample_rate: int, bitrate: int) -> bytes:
    return (
        b"\x01vorbis"
        + (0).to_bytes(4, "little")  # vorbis_version
        + bytes([channels])
        + sample_rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little", signed=True)  # bitrate_maximum
        + bitrate.to_bytes(4, "little", signed=True)  # bitrate_nominal
        + (0).to_bytes(4, "little", signed=True)  # bitrate_minimum
        + bytes([0xB8])  # blocksizes 2^8 / 2^11
        + b"\x01"  # framing bit
    )


def parse_vorbis_id(packet: bytes) -> dict:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("not a Vorbis identification header")
    if int.from_bytes(packet[7:11], "little") != 0:
        raise ValueError("unsupported vorbis_version")
    if not packet[29] & 0x01:
        raise ValueError("ID header framing bit unset")
    return {
        "channels": packet[11],
        "sample_rate": int.from_bytes(packet[12:16], "little"),
        "bitrate_nominal": int.from_bytes(packet[20:24], "little", signed=True),
    }


def vorbis_comment_packet(vendor: str, comments: list[tuple[str, str]]) -> bytes:
    from kafka_streams_common_spark.operators.flac import _vorbis_comment_block

    return b"\x03vorbis" + _vorbis_comment_block(vendor, comments) + b"\x01"


def parse_vorbis_comment(packet: bytes) -> tuple[str, dict[str, str]]:
    from kafka_streams_common_spark.operators.flac import _parse_vorbis_comment

    if packet[:7] != b"\x03vorbis":
        raise ValueError("not a Vorbis comment header")
    if packet[-1] != 0x01:
        raise ValueError("comment header framing bit unset")
    return _parse_vorbis_comment(packet[7:-1])


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_OGG_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def encode_ogg_meta(docs: DataFrame) -> DataFrame:
    """documents → one 3-page Ogg Vorbis logical stream per row: BOS
    page (ID header; channels/rate/bitrate from the md5 arithmetic), a
    comment page whose packet is PADDED past 255 bytes (multi-segment
    lacing is live on every row), and an EOS audio page whose granule
    position is the total-sample count. Map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                did = int(did)
                text = str(text)
                d = hashlib.md5(text.encode()).digest()
                serial = int.from_bytes(d[8:12], "big")
                channels = d[1] % 2 + 1
                rate = _SAMPLE_RATES[d[0] % 5]
                bitrate = (d[2] % 8 + 1) * 32000
                total = int.from_bytes(d[3:7], "big") % 10_000_000
                ident = vorbis_id_packet(channels, rate, bitrate)
                comment = vorbis_comment_packet(
                    "kafka-streams-common-spark",
                    [
                        ("TITLE", f"Doc {did}"),
                        ("LANGUAGE", str(lang)),
                        # pad the packet past one lacing segment
                        ("PAD", "x" * (260 + did % 40)),
                    ],
                )
                audio = (d * 20)[: 64 + did % 64]
                payloads.append(
                    build_page(ident, serial, 0, 0, bos=True)
                    + build_page(comment, serial, 1, 0)
                    + build_page(audio, serial, 2, total, eos=True)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads},
                columns=["doc_id", "payload"],
            )

    return docs.select("doc_id", "text", "lang").mapInPandas(batches, _OGG_OUT)


_OGG_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_pages", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("bitrate_nominal", T.IntegerType(), False),
        T.StructField("total_samples", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("language", T.StringType(), False),
        T.StructField("comment_segments", T.IntegerType(), False),
    ]
)


def decode_ogg_meta(streams: DataFrame) -> DataFrame:
    """Map-only Ogg ingest: page walk (capture pattern, from-scratch
    CRC, sequence continuity, BOS/EOS discipline), Vorbis ID + comment
    header parse, duration from the EOS granule. The emitted
    ``comment_segments`` pins the multi-segment lacing walk — it is
    ``(packet_len // 255) + 1`` only if lacing was honored. Every
    column oracle-replayable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                pages = parse_pages(bytes(payload))
                ident = parse_vorbis_id(pages[0]["packet"])
                _, comments = parse_vorbis_comment(pages[1]["packet"])
                rows.append(
                    {
                        "doc_id": int(did),
                        "n_pages": len(pages),
                        "channels": ident["channels"],
                        "sample_rate": ident["sample_rate"],
                        "bitrate_nominal": ident["bitrate_nominal"],
                        "total_samples": pages[-1]["granule"],
                        "title": comments["TITLE"],
                        "language": comments["LANGUAGE"],
                        "comment_segments": pages[1]["n_segments"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _OGG_META])

    return streams.mapInPandas(batches, _OGG_META)
