"""MP4 / ISO-BMFF box walk (r14): size-grammar enforcement (normal /
64-bit largesize / runs-to-EOF), mvhd+mdhd version 0 and 1, packed
language codes, track dispatch, error paths, Spark e2e."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import mp4

_l3 = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=3, max_size=3)


@settings(deadline=None, max_examples=100)
@given(_l3)
def test_lang_pack_roundtrip(code):
    assert mp4._unpack_lang(mp4._pack_lang(code)) == code


def _skeleton(doc_id=7, mdat_form="large", lang="eng"):
    return mp4.build_mp4_meta(
        doc_id, 45_000, 320, 176, 44100, lang, b"\xab" * 50, mdat_form
    )


@pytest.mark.parametrize("mdat_form", ["normal", "large", "eof"])
def test_mp4_roundtrip(mdat_form):
    raw = _skeleton(mdat_form=mdat_form)
    m = mp4.parse_mp4_meta(raw)
    assert m["major_brand"] == "isom"
    assert (m["timescale"], m["duration"]) == (1000, 45_000)
    assert m["mdat_bytes"] == 50
    vid, aud = m["tracks"]
    assert (vid["handler"], aud["handler"]) == ("vide", "soun")
    assert (vid["width"], vid["height"]) == (320, 176)
    assert vid["media_timescale"] == 90000
    assert aud["media_timescale"] == 44100
    assert vid["lang"] == "eng" and vid["name"] == "vide:doc-7"


def test_mp4_box_grammar_rejections():
    raw = bytearray(_skeleton(mdat_form="normal"))
    # inflate the ftyp size so it overruns the file
    raw[0:4] = (len(raw) + 100).to_bytes(4, "big")
    with pytest.raises(ValueError, match="overruns"):
        mp4.parse_mp4_meta(bytes(raw))
    # size smaller than the 8-byte header
    with pytest.raises(ValueError, match="smaller than header"):
        list(mp4.walk_boxes(b"\x00\x00\x00\x04free", 0, 8))
    # largesize smaller than its 16-byte header
    bad = (1).to_bytes(4, "big") + b"mdat" + (8).to_bytes(8, "big")
    with pytest.raises(ValueError, match="largesize"):
        list(mp4.walk_boxes(bad, 0, len(bad)))
    with pytest.raises(ValueError, match="truncated box header"):
        list(mp4.walk_boxes(b"\x00\x00\x00", 0, 3))


def test_mp4_missing_required_boxes():
    mdat = mp4._box(b"mdat", b"xx")
    with pytest.raises(ValueError, match="ftyp"):
        mp4.parse_mp4_meta(mdat)
    ftyp = mp4._box(b"ftyp", b"isom" + (512).to_bytes(4, "big"))
    with pytest.raises(ValueError, match="mvhd"):
        mp4.parse_mp4_meta(ftyp + mdat)


def test_mdhd_version1_parsed():
    # hand-build a trak whose mdhd uses 64-bit times
    trak = mp4._box(
        b"trak",
        mp4._tkhd(1, 1000, 64, 48)
        + mp4._box(
            b"mdia",
            mp4._mdhd(90000, 90_000_000, "fra", version=1)
            + mp4._hdlr(b"vide", "vide:doc-1"),
        ),
    )
    raw = (
        mp4._box(b"ftyp", b"isom" + (512).to_bytes(4, "big"))
        + mp4._box(b"moov", mp4._mvhd(1000, 1000) + trak)
    )
    m = mp4.parse_mp4_meta(raw)
    t = m["tracks"][0]
    assert t["media_timescale"] == 90000 and t["lang"] == "fra"


def test_bad_lang_code_rejected():
    with pytest.raises(ValueError, match="language"):
        mp4._pack_lang("e1g")


def test_spark_mp4_metadata(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"video doc {i} " + "q" * (i * 11 % 90), ["en", "zh"][i % 2])
         for i in range(8)],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in
           mp4.decode_mp4_meta(mp4.encode_mp4_meta(docs)).collect()}
    assert len(out) == 8
    for did, r in out.items():
        text = f"video doc {did} " + "q" * (did * 11 % 90)
        hx = hashlib.md5(text.encode()).hexdigest()
        d = bytes.fromhex(hx)
        assert r["duration_ms"] == int.from_bytes(d[0:3], "big") % 600_000 + 1000
        assert r["video_width"] == (int(hx[:15], 16) % 16 + 1) * 16
        assert r["audio_rate"] == (8000, 16000, 22050, 44100, 48000)[d[3] % 5]
        assert r["lang"] == ("eng" if did % 2 == 0 else "zho")
        assert r["mdat_bytes"] == len(text) % 256 + 32
        assert r["n_tracks"] == 2
