"""Audio-metadata wave (r14): FLAC metadata blocks (STREAMINFO
bit-packing, little-endian Vorbis comments, padding verification) and
ID3v2.3 (synchsafe header, plain-BE frame sizes, latin-1/UTF-16 text,
dual-tag files) — properties, spec traps, error paths, Spark e2e."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import flac as fl
from kafka_streams_common_spark.operators import mpeg_audio as ma

# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=100)
@given(
    st.integers(min_value=1, max_value=(1 << 20) - 1),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=4, max_value=32),
    st.integers(min_value=0, max_value=(1 << 36) - 1),
    st.binary(min_size=16, max_size=16),
)
def test_streaminfo_bitpack_roundtrip(sr, ch, bps, total, md5):
    body = fl._streaminfo_block(sr, ch, bps, total, md5)
    got = fl._parse_streaminfo(body)
    assert got["sample_rate"] == sr
    assert got["channels"] == ch
    assert got["bits_per_sample"] == bps
    assert got["total_samples"] == total
    assert got["audio_md5"] == md5.hex()


def test_streaminfo_range_checks():
    with pytest.raises(ValueError, match="channels"):
        fl._streaminfo_block(44100, 9, 16, 0, b"\x00" * 16)
    with pytest.raises(ValueError, match="bits"):
        fl._streaminfo_block(44100, 2, 33, 0, b"\x00" * 16)
    with pytest.raises(ValueError, match="overflow"):
        fl._streaminfo_block(1 << 20, 2, 16, 0, b"\x00" * 16)
    with pytest.raises(ValueError, match="md5"):
        fl._streaminfo_block(44100, 2, 16, 0, b"\x00" * 15)


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x21, max_codepoint=0x7E, exclude_characters="="
                ),
                min_size=1,
                max_size=12,
            ),
            st.text(max_size=40),
        ),
        max_size=6,
        unique_by=lambda kv: kv[0].upper(),
    )
)
def test_vorbis_comment_roundtrip(comments):
    body = fl._vorbis_comment_block("vendor α", comments)
    vendor, got = fl._parse_vorbis_comment(body)
    assert vendor == "vendor α"
    assert got == {k.upper(): v for k, v in comments}


def test_vorbis_comment_errors():
    body = fl._vorbis_comment_block("v", [("A", "b")])
    with pytest.raises(ValueError, match="trailing"):
        fl._parse_vorbis_comment(body + b"x")
    bad = fl._vorbis_comment_block("v", [])
    # splice in a comment without '='
    entry = b"noequals"
    bad = bad[:-4] + (1).to_bytes(4, "little") + len(entry).to_bytes(4, "little") + entry
    with pytest.raises(ValueError, match="'='"):
        fl._parse_vorbis_comment(bad)


def _meta(padding=32):
    return fl.build_flac_meta(
        44100, 2, 16, 1_000_000, b"\xab" * 16, [("TITLE", "t"), ("X", "y")], padding
    )


def test_flac_meta_roundtrip():
    m = fl.parse_flac_meta(_meta())
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["total_samples"] == 1_000_000
    assert m["comments"] == {"TITLE": "t", "X": "y"}
    assert m["n_blocks"] == 3


def test_flac_unknown_block_skipped():
    # splice a PICTURE-ish block (type 6) between comment and padding
    raw = _meta()
    pad_at = raw.rindex(bytes([0x81]))  # is-last PADDING header byte
    extra = fl._block(6, b"fake picture data", False)
    patched = raw[:pad_at] + extra + raw[pad_at:]
    m = fl.parse_flac_meta(patched)
    assert m["n_blocks"] == 4
    assert m["comments"]["TITLE"] == "t"


def test_flac_errors():
    with pytest.raises(ValueError, match="not a FLAC"):
        fl.parse_flac_meta(b"fLaX" + b"\x00" * 40)
    raw = _meta()
    with pytest.raises(ValueError, match="bytes after last"):
        fl.parse_flac_meta(raw + b"\x00")
    # corrupt the padding fill
    bad = bytearray(raw)
    bad[-1] = 0x7F
    with pytest.raises(ValueError, match="zero-filled"):
        fl.parse_flac_meta(bytes(bad))
    # first block must be STREAMINFO: flip its type byte to 2
    bad = bytearray(raw)
    bad[4] = 2
    with pytest.raises(ValueError, match="must be STREAMINFO"):
        fl.parse_flac_meta(bytes(bad))
    with pytest.raises(ValueError, match="invalid per spec"):
        fl.parse_flac_meta(
            fl.FLAC_MAGIC
            + fl._block(0, fl._streaminfo_block(8000, 1, 8, 0, b"\x00" * 16), False)
            + fl._block(127, b"", True)
        )


def test_spark_flac_metadata(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}" * (i + 1), "en") for i in range(8)],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in
           fl.decode_flac_meta(fl.encode_flac_meta(docs)).collect()}
    assert len(out) == 8
    import hashlib

    d = hashlib.md5(("text-3" * 4).encode()).digest()
    assert out[3]["sample_rate"] == fl._SAMPLE_RATES[d[0] % 5]
    assert out[3]["channels"] == d[1] % 2 + 1
    assert out[3]["title"] == "Doc 3"
    assert out[3]["audio_md5"] == hashlib.md5(("text-3" * 4)[::-1].encode()).hexdigest()


# ---------------------------------------------------------------------------
# ID3v2.3
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=100)
@given(st.integers(min_value=0, max_value=(1 << 28) - 1))
def test_synchsafe_roundtrip(n):
    assert ma._read_synchsafe(ma._synchsafe(n)) == n


def test_synchsafe_high_bit_rejected():
    with pytest.raises(ValueError, match="high bit"):
        ma._read_synchsafe(b"\x80\x00\x00\x00")
    with pytest.raises(ValueError, match="overflow"):
        ma._synchsafe(1 << 28)


@pytest.mark.parametrize("utf16", [False, True])
def test_id3v2_roundtrip(utf16):
    text = "Tïtle — ünïcode" if utf16 else "Plain Title"
    tag = ma._id3v2_tag(
        [("TIT2", text), ("TPE1", "artist"), ("TYER", "2001")],
        comment=("eng", "note", "hello world"),
        utf16=utf16,
        padding=13,
    )
    fields, enc, total = ma._parse_id3v2(tag + b"\xffEXTRA")
    assert total == len(tag)
    assert fields["TIT2"] == text
    assert fields["TPE1"] == "artist"
    assert fields["COMM"] == "hello world"
    assert fields["COMM_LANG"] == "eng"
    assert enc == ("utf16" if utf16 else "latin1")


def test_id3v2_frame_size_is_plain_be():
    # a frame body > 127 bytes: synchsafe misreads it, plain BE must not
    long_text = "x" * 300
    tag = ma._id3v2_tag([("TIT2", long_text)], None, utf16=False)
    fields, _, _ = ma._parse_id3v2(tag)
    assert fields["TIT2"] == long_text


def test_id3v2_utf16_terminator_full_code_unit():
    # U+0100 encodes LE as 00 01 — a byte-wise rstrip would corrupt it
    body = b"\x01\xff\xfe" + "abĀ".encode("utf-16-le") + b"\x00\x00"
    text, enc = ma._decode_id3v2_text(body)
    assert text == "abĀ" and enc == "utf16"
    # big-endian BOM accepted too
    body = b"\x01\xfe\xff" + "ab".encode("utf-16-be")
    assert ma._decode_id3v2_text(body)[0] == "ab"


def test_id3v2_errors():
    with pytest.raises(ValueError, match="no ID3v2"):
        ma._parse_id3v2(b"XXX")
    tag = bytearray(ma._id3v2_tag([("TIT2", "t")], None, utf16=False))
    tag[3] = 4  # version 4
    with pytest.raises(ValueError, match="version"):
        ma._parse_id3v2(bytes(tag))
    tag = bytearray(ma._id3v2_tag([("TIT2", "t")], None, utf16=False))
    tag[5] = 0x80  # unsynchronisation flag
    with pytest.raises(ValueError, match="flags"):
        ma._parse_id3v2(bytes(tag))
    # garbage inside padding
    tag = ma._id3v2_tag([("TIT2", "t")], None, utf16=False, padding=8)
    bad = bytearray(tag)
    bad[-1] = 0x55
    with pytest.raises(ValueError, match="padding"):
        ma._parse_id3v2(bytes(bad))
    # unsupported frame id
    frame = b"PRIV" + (1).to_bytes(4, "big") + b"\x00\x00" + b"z"
    raw = b"ID3\x03\x00\x00" + ma._synchsafe(len(frame)) + frame
    with pytest.raises(ValueError, match="unsupported ID3v2 frame"):
        ma._parse_id3v2(raw)
    # missing BOM
    with pytest.raises(ValueError, match="BOM"):
        ma._decode_id3v2_text(b"\x01no-bom")


def test_spark_mp3_id3v2(spark):
    docs = spark.createDataFrame(
        [(i, f"audio doc {i}", ["en", "de"][i % 2]) for i in range(6)],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in
           ma.decode_mp3_id3v2(ma.encode_mp3_id3v2(docs)).collect()}
    assert len(out) == 6
    assert out[4]["title"] == "Doc 4" and out[4]["text_encoding"] == "latin1"
    assert out[5]["text_encoding"] == "utf16"
    assert out[5]["year_v2"] == 1995 and out[5]["year_v1"] == 1985
    assert out[5]["track"] == 6
    assert out[5]["n_frames"] == len("audio doc 5") % 8 + 2
