"""Ogg/Vorbis tier (r14): the from-scratch page CRC pinned against the
RFC's polynomial behavior (and explicitly DIFFERENT from zlib's), page
walk discipline (CRC, sequence gaps, BOS/EOS), multi-segment lacing
incl. the 255-multiple edge, Vorbis header parses, Spark e2e."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import ogg


def test_ogg_crc_is_not_zlib():
    data = b"The quick brown fox"
    assert ogg.ogg_crc(data) != (zlib.crc32(data) & 0xFFFFFFFF)
    assert ogg.ogg_crc(b"") == 0
    # linearity pin: one trailing zero byte shifts the register
    assert ogg.ogg_crc(b"\x00") == 0


@settings(deadline=None, max_examples=60)
@given(st.binary(max_size=700), st.integers(min_value=0, max_value=2**31))
def test_page_roundtrip(packet, serial):
    page = ogg.build_page(packet, serial, 0, 42, bos=True, eos=True)
    pages = ogg.parse_pages(page)
    assert len(pages) == 1
    assert pages[0]["packet"] == packet
    assert pages[0]["granule"] == 42
    assert pages[0]["serial"] == serial
    assert pages[0]["n_segments"] == len(packet) // 255 + 1


def test_lacing_multiple_of_255():
    packet = b"\xaa" * 510  # exact multiple: trailing 0 lacing value
    page = ogg.build_page(packet, 1, 0, 0, bos=True, eos=True)
    pages = ogg.parse_pages(page)
    assert pages[0]["packet"] == packet
    assert pages[0]["n_segments"] == 3  # 255, 255, 0


def _three_pages():
    ident = ogg.vorbis_id_packet(2, 44100, 128000)
    comment = ogg.vorbis_comment_packet("v", [("TITLE", "t"), ("PAD", "x" * 300)])
    return (
        ogg.build_page(ident, 9, 0, 0, bos=True)
        + ogg.build_page(comment, 9, 1, 0)
        + ogg.build_page(b"\x01" * 32, 9, 2, 1234, eos=True)
    )


def test_page_walk_discipline():
    raw = bytearray(_three_pages())
    ogg.parse_pages(bytes(raw))  # sanity

    bad = bytearray(raw)
    bad[-1] ^= 0xFF  # corrupt the last page's body
    with pytest.raises(ValueError, match="CRC"):
        ogg.parse_pages(bytes(bad))

    # strip EOS: reuse first two pages only
    first_two = bytes(raw)[: len(ogg.build_page(ogg.vorbis_id_packet(2, 44100, 128000), 9, 0, 0, bos=True))]
    with pytest.raises(ValueError, match="EOS"):
        ogg.parse_pages(first_two)

    # sequence gap: rebuild with seq 0 then 2
    ident = ogg.vorbis_id_packet(2, 44100, 128000)
    gap = ogg.build_page(ident, 9, 0, 0, bos=True) + ogg.build_page(
        b"x", 9, 2, 0, eos=True
    )
    with pytest.raises(ValueError, match="sequence gap"):
        ogg.parse_pages(gap)

    # non-BOS first page
    nb = ogg.build_page(b"x", 9, 0, 0, eos=True)
    with pytest.raises(ValueError, match="BOS"):
        ogg.parse_pages(nb)


def test_vorbis_headers():
    ident = ogg.vorbis_id_packet(1, 48000, 96000)
    got = ogg.parse_vorbis_id(ident)
    assert got == {"channels": 1, "sample_rate": 48000, "bitrate_nominal": 96000}
    with pytest.raises(ValueError, match="identification"):
        ogg.parse_vorbis_id(b"\x03vorbis" + ident[7:])
    # framing bit unset
    with pytest.raises(ValueError, match="framing"):
        ogg.parse_vorbis_id(ident[:-1] + b"\x00")

    com = ogg.vorbis_comment_packet("vend", [("A", "b"), ("C", "d")])
    vendor, fields = ogg.parse_vorbis_comment(com)
    assert vendor == "vend" and fields == {"A": "b", "C": "d"}
    with pytest.raises(ValueError, match="framing"):
        ogg.parse_vorbis_comment(com[:-1] + b"\x00")


def test_spark_ogg(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"ogg doc {i} " + "w" * (i * 17 % 70), ["en", "fr"][i % 2])
         for i in range(8)],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in
           ogg.decode_ogg_meta(ogg.encode_ogg_meta(docs)).collect()}
    assert len(out) == 8
    for did, r in out.items():
        text = f"ogg doc {did} " + "w" * (did * 17 % 70)
        d = hashlib.md5(text.encode()).digest()
        assert r["channels"] == d[1] % 2 + 1
        assert r["sample_rate"] == ogg._SAMPLE_RATES[d[0] % 5]
        assert r["bitrate_nominal"] == (d[2] % 8 + 1) * 32000
        assert r["total_samples"] == int.from_bytes(d[3:7], "big") % 10_000_000
        assert r["title"] == f"Doc {did}"
        assert r["n_pages"] == 3
        assert r["comment_segments"] == 2


def test_truncated_page_header_rejected():
    page = ogg.build_page(b"xyz", 1, 0, 0, bos=True, eos=True)
    with pytest.raises(ValueError, match="truncated Ogg page header"):
        ogg.parse_pages(page + b"OggS\x00")
