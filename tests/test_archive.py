"""Archive-container tier (r14): gzip members (RFC 1952) and ustar tar
shards — round trips, STDLIB INTERCHANGE pins (our bytes open with
``gzip``/``tarfile`` and vice versa), integrity-field rejection paths,
and the Spark operators against pure-Python replays."""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators.archive import (
    _gzip_compress_bytes,
    _gzip_decompress_bytes,
    _parse_tar,
    _tar_bytes,
    _tar_header,
    decode_gzip_text_stats,
    decode_webdataset_pairs,
    encode_gzip_docs,
    encode_webdataset_shard,
)


@settings(deadline=None, max_examples=40)
@given(
    data=st.binary(min_size=0, max_size=5000),
    named=st.booleans(),
    level=st.sampled_from([1, 6, 9]),
)
def test_gzip_roundtrip_and_stdlib_interchange(data, named, level):
    import gzip as stdgzip

    blob = _gzip_compress_bytes(
        data, fname="member.bin" if named else None, level=level
    )
    # ours -> stdlib
    assert stdgzip.decompress(blob) == data
    # ours -> ours, with name recovery
    fname, out = _gzip_decompress_bytes(blob)
    assert out == data
    assert fname == ("member.bin" if named else None)
    # stdlib -> ours
    fname2, out2 = _gzip_decompress_bytes(stdgzip.compress(data, mtime=0))
    assert out2 == data


def test_gzip_rejection_paths():
    data = b"x" * 4096
    blob = _gzip_compress_bytes(data, fname="a.txt")
    with pytest.raises(ValueError, match="not a gzip"):
        _gzip_decompress_bytes(b"\x1f\x8c" + blob[2:])
    with pytest.raises(ValueError, match="compression method"):
        _gzip_decompress_bytes(blob[:2] + b"\x07" + blob[3:])
    with pytest.raises(ValueError, match="reserved"):
        _gzip_decompress_bytes(blob[:3] + bytes([blob[3] | 0x20]) + blob[4:])
    # CRC flip
    bad = bytearray(blob)
    bad[-6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        _gzip_decompress_bytes(bytes(bad))
    # ISIZE flip
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="ISIZE"):
        _gzip_decompress_bytes(bytes(bad))
    # trailing garbage after the trailer
    with pytest.raises(ValueError, match="trailer"):
        _gzip_decompress_bytes(blob + b"junk")
    # truncated member
    with pytest.raises(ValueError, match="truncated|trailer"):
        _gzip_decompress_bytes(blob[:12])


@settings(deadline=None, max_examples=30)
@given(data=st.data())
def test_tar_roundtrip_and_stdlib_interchange(data):
    import tarfile

    n = data.draw(st.integers(1, 5))
    members = []
    for i in range(n):
        size = data.draw(
            st.one_of(
                st.integers(0, 40),
                st.sampled_from([511, 512, 513, 1024]),  # padding boundaries
            )
        )
        members.append((f"m{i}.bin", data.draw(st.binary(min_size=size, max_size=size))))
    blob = _tar_bytes(members)
    assert len(blob) % 512 == 0
    # ours -> ours
    assert _parse_tar(blob) == members
    # ours -> stdlib
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    # stdlib -> ours
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for name, d in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(d)
            w.addfile(ti, io.BytesIO(d))
    assert _parse_tar(buf.getvalue()) == members


def test_tar_rejection_paths():
    blob = _tar_bytes([("a.txt", b"hello")])
    # checksum break
    bad = bytearray(blob)
    bad[0] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        _parse_tar(bytes(bad))
    # magic break (re-checksum so ONLY the magic is wrong)
    hdr = bytearray(blob[:512])
    hdr[257:263] = b"gnutar"
    hdr[148:156] = b" " * 8
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
    with pytest.raises(ValueError, match="ustar magic"):
        _parse_tar(bytes(hdr) + blob[512:])
    # missing end block
    with pytest.raises(ValueError, match="zero end-block"):
        _parse_tar(blob[:-1024])
    # truncated member data
    with pytest.raises(ValueError, match="truncated"):
        _parse_tar(blob[:512] + b"he")
    # oversized name
    with pytest.raises(ValueError, match="100 bytes"):
        _tar_header("x" * 101, 0)


def test_gzip_spark_stats_match_replay(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta beta"), (2, "gamma!"), (3, "δelta unicode")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_gzip_text_stats(encode_gzip_docs(docs)).collect()}
    texts = {0: "alpha", 1: "beta beta", 2: "gamma!", 3: "δelta unicode"}
    for did, text in texts.items():
        r = rows[did]
        assert r["member_name"] == (f"doc-{did}.txt" if did % 2 == 0 else None)
        assert r["n_bytes"] == len(text.encode())
        assert r["text_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_webdataset_spark_pairs_match_replay(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta"), (3, "gamma!")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_webdataset_pairs(encode_webdataset_shard(docs)).collect()}
    assert set(rows) == {1, 2, 3}  # doc_id RECOVERED from member names
    for did, text in ((1, "alpha"), (2, "beta beta"), (3, "gamma!")):
        hx = hashlib.md5(text.encode()).hexdigest()
        w = int(hx[:15], 16) % 16 + 1
        h = int(hashlib.md5(text[::-1].encode()).hexdigest()[:15], 16) % 16 + 1
        raster = (bytes.fromhex(hx) * ((w * h + 15) // 16))[: w * h]
        r = rows[did]
        assert (r["width"], r["height"], r["n_members"]) == (w, h, 2)
        assert abs(r["mean_px"] - np.frombuffer(raster, np.uint8).mean()) < 1e-12
        assert r["caption_bytes"] == len(text.encode())
        assert r["caption_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_webdataset_rejects_incomplete_pairs(spark):
    from kafka_streams_common_spark.operators.archive import _tar_bytes

    shard = _tar_bytes([("doc-7.pgm", b"P5\n1 1\n255\nx")])  # no caption
    df = spark.createDataFrame([(bytearray(shard),)], ["payload"])
    with pytest.raises(Exception, match="incomplete WebDataset pair"):
        decode_webdataset_pairs(df).collect()


# ---------------------------------------------------------------------------
# PKZIP (r14)

from kafka_streams_common_spark.operators.archive import (  # noqa: E402
    _parse_zip,
    _zip_bytes,
    decode_zip_bundles,
    encode_zip_bundles,
)


@settings(deadline=None, max_examples=30)
@given(data=st.data())
def test_zip_roundtrip_and_stdlib_interchange(data):
    import zipfile

    n = data.draw(st.integers(1, 5))
    members = []
    for i in range(n):
        body = data.draw(st.binary(min_size=0, max_size=2000))
        members.append((f"m{i}.bin", body, data.draw(st.booleans())))
    blob = _zip_bytes(members)
    want = [(name, body) for name, body, _ in members]
    # ours -> ours
    assert _parse_zip(blob) == want
    # ours -> stdlib
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == want
    # stdlib -> ours (stdlib picks its own method per member)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as w:
        for i, (name, body) in enumerate(want):
            w.writestr(
                name,
                body,
                compress_type=zipfile.ZIP_DEFLATED if i % 2 else zipfile.ZIP_STORED,
            )
    assert _parse_zip(buf.getvalue()) == want


def test_zip_rejection_paths():
    blob = _zip_bytes([("a.txt", b"hello zip world" * 20, True)])
    # no EOCD
    with pytest.raises(ValueError, match="end-of-central-directory"):
        _parse_zip(blob[: blob.rfind(b"PK\x05\x06")])
    # trailing garbage not covered by the comment-length field
    with pytest.raises(ValueError, match="comment length"):
        _parse_zip(blob + b"junk")
    # CRC flip (both central and local copies, so only the CRC breaks)
    bad = bytearray(blob)
    lho_crc = 14  # local header CRC offset
    cd = blob.find(b"PK\x01\x02")
    bad[lho_crc] ^= 0xFF
    bad[cd + 16] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        _parse_zip(bytes(bad))
    # central/local name mismatch
    bad = bytearray(blob)
    bad[30] ^= 1  # first byte of the local header's name
    with pytest.raises(ValueError, match="name mismatch"):
        _parse_zip(bytes(bad))
    # unsupported method (both copies)
    bad = bytearray(blob)
    bad[8] = 99
    bad[cd + 10] = 99
    with pytest.raises(ValueError, match="compression method"):
        _parse_zip(bytes(bad))
    # encrypted flag
    bad = bytearray(blob)
    bad[cd + 8] |= 1
    with pytest.raises(ValueError, match="encrypted"):
        _parse_zip(bytes(bad))
    # data-descriptor flag
    bad = bytearray(blob)
    bad[cd + 8] |= 8
    with pytest.raises(ValueError, match="data-descriptor"):
        _parse_zip(bytes(bad))


def test_zip_spark_bundles_match_replay(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta beta"), (2, "γ unicode")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_zip_bundles(encode_zip_bundles(docs)).collect()}
    assert set(rows) == {0, 1, 2}  # doc_id RECOVERED from member names
    for did, text in ((0, "alpha"), (1, "beta beta"), (2, "γ unicode")):
        r = rows[did]
        assert r["n_members"] == 2
        assert r["text_bytes"] == len(text.encode())
        assert r["text_md5"] == hashlib.md5(text.encode()).hexdigest()
        assert r["rev_md5"] == hashlib.md5(text[::-1].encode()).hexdigest()


def test_zip_rejects_incomplete_bundles(spark):
    shard = _zip_bytes([("doc-7.txt", b"only text", True)])
    df = spark.createDataFrame([(bytearray(shard),)], ["payload"])
    with pytest.raises(Exception, match="incomplete zip bundle"):
        decode_zip_bundles(df).collect()


# ---------------------------------------------------------------------------
# bz2 / xz members (r14 wave 4)
# ---------------------------------------------------------------------------

from kafka_streams_common_spark.operators.archive import (  # noqa: E402
    _bz2_compress_member,
    _bz2_crc32,
    _bz2_verify_and_decompress,
    _xz_compress_member,
    _xz_verify_and_decompress,
    decode_bz2_xz_text_stats,
    encode_bz2_xz_docs,
)


@given(
    data=st.binary(min_size=0, max_size=4000),
    level=st.integers(min_value=1, max_value=9),
    check=st.sampled_from(["crc32", "crc64"]),
)
@settings(max_examples=40, deadline=None)
def test_bz2_xz_roundtrip(data, level, check):
    lvl, out = _bz2_verify_and_decompress(_bz2_compress_member(data, level))
    assert (lvl, out) == (level, data)
    chk, out = _xz_verify_and_decompress(_xz_compress_member(data, check))
    assert (chk, out) == (check, data)


def test_bz2_crc_is_not_reflected():
    """bzip2's block CRC uses MSB-first bit order — the reflected
    zlib.crc32 must NOT agree (except by astronomically unlikely
    coincidence on this fixed vector)."""
    import zlib

    data = b"the quick brown fox jumps over the lazy dog"
    assert _bz2_crc32(data) != (zlib.crc32(data) & 0xFFFFFFFF)
    # and it must equal what bzip2 itself wrote into the block header
    blob = _bz2_compress_member(data, 1)
    assert int.from_bytes(blob[10:14], "big") == _bz2_crc32(data)


def test_bz2_rejection_paths():
    blob = bytearray(_bz2_compress_member(b"payload bytes here", 2))
    bad = bytearray(blob)
    bad[0] = 0x42  # 'B' stays, kill the h
    bad[2] = 0x78
    with pytest.raises(ValueError, match="not a bzip2"):
        _bz2_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[3] = 0x30  # level digit '0'
    with pytest.raises(ValueError, match="block-size digit"):
        _bz2_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[5] ^= 0xFF  # block magic
    with pytest.raises(ValueError, match="block magic"):
        _bz2_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[11] ^= 0x01  # stored block CRC — the codec's own check trips first
    with pytest.raises(ValueError, match="corrupt bzip2|CRC mismatch"):
        _bz2_verify_and_decompress(bytes(bad))
    with pytest.raises(Exception, match="truncated|Compressed data ended"):
        _bz2_verify_and_decompress(bytes(blob[:-4]))
    with pytest.raises(ValueError, match="trailing garbage"):
        _bz2_verify_and_decompress(bytes(blob) + b"xx")


def test_xz_rejection_paths():
    blob = bytearray(_xz_compress_member(b"payload bytes here", "crc32"))
    bad = bytearray(blob)
    bad[1] ^= 0xFF
    with pytest.raises(ValueError, match="not an xz"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[7] = 0x0A  # check id SHA-256: valid xz, outside our flag set
    with pytest.raises(ValueError, match="unsupported xz stream flags"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[9] ^= 0x01  # header CRC32 over the flags
    with pytest.raises(ValueError, match="header CRC32"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[-1] ^= 0xFF  # footer magic
    with pytest.raises(ValueError, match="footer magic"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[-3] = 0x04  # footer flags: crc64 — spliced-stream trap
    with pytest.raises(ValueError, match="flags differ"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[-12] ^= 0x01  # footer CRC32
    with pytest.raises(ValueError, match="footer CRC32"):
        _xz_verify_and_decompress(bytes(bad))
    bad = bytearray(blob)
    bad[-8] = 0xFF  # backward size points into the void
    bad[0:0] = b""  # keep bytearray
    # recompute footer CRC so ONLY the backward walk fails
    import zlib

    crc = zlib.crc32(bytes(bad[-8:-2])) & 0xFFFFFFFF
    bad[-12:-8] = crc.to_bytes(4, "little")
    with pytest.raises(ValueError, match="index indicator"):
        _xz_verify_and_decompress(bytes(bad))


def test_bz2_xz_spark_stats_match_replay(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta beta"), (2, "γ unicode"), (3, "delta!"),
         (4, "epsilon"), (17, "xz with crc32"), (19, "xz with crc64")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict()
            for r in decode_bz2_xz_text_stats(encode_bz2_xz_docs(docs)).collect()}
    assert rows[0]["codec"] == "bz2" and rows[0]["level"] == 1
    assert rows[4]["codec"] == "bz2" and rows[4]["level"] == 5
    assert rows[2]["level"] == 3 and rows[2]["check_name"] is None
    assert rows[17]["check_name"] == "crc32" and rows[17]["level"] is None
    assert rows[19]["check_name"] == "crc64"
    assert rows[1]["codec"] == "xz" and rows[1]["check_name"] == "crc32"
    assert rows[3]["check_name"] == "crc64"
    for did, text in ((0, "alpha"), (2, "γ unicode"), (17, "xz with crc32")):
        assert rows[did]["n_bytes"] == len(text.encode())
        assert rows[did]["text_md5"] == hashlib.md5(text.encode()).hexdigest()
