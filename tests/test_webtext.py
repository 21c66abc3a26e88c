"""Web-scrape tier (r14): HTML escape/unescape pinned against the
stdlib html module, render→extract roundtrip properties, the raw-text
and comment traps, WARC/HTTP framing integrity checks, and the Spark
operators end to end."""

from __future__ import annotations

import hashlib
import html as stdlib_html

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import warc as w
from kafka_streams_common_spark.operators import webtext as wt

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=600,
)


@settings(deadline=None, max_examples=120)
@given(_ascii_text)
def test_escape_pins_stdlib(s):
    assert wt.escape_html(s) == stdlib_html.escape(s, quote=True).replace(
        "&#x27;", "'"
    )
    assert wt.unescape_html(wt.escape_html(s)) == s


def test_unescape_forms():
    assert wt.unescape_html("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert wt.unescape_html("&#65;&#x42;&#x63;") == "ABc"
    # unknown and unterminated references pass through verbatim
    assert wt.unescape_html("&nope;&amp") == "&nope;&amp"
    assert wt.unescape_html("a & b") == "a & b"


@settings(deadline=None, max_examples=60)
@given(
    st.integers(min_value=0, max_value=10_000),
    _ascii_text,
    st.sampled_from(["en", "de", "fr"]),
)
def test_render_extract_roundtrip(doc_id, text, lang):
    page = wt.render_doc_html(doc_id, text, lang)
    ex = wt.extract_main_text(page)
    assert "".join(ex.main_parts) == text
    assert ex.title == wt.title_for(doc_id, lang)
    assert ex.h1 == f"Doc {doc_id}"
    assert ex.lang == lang
    assert ex.n_links == doc_id % 3 + 5
    assert ex.n_paragraphs == (len(text) + wt.PARA_CHARS - 1) // wt.PARA_CHARS


def test_raw_text_and_comment_traps():
    page = wt.render_doc_html(3, "real content", "en")
    ex = wt.extract_main_text(page)
    joined = "".join(ex.main_parts)
    assert "not content" not in joined
    assert joined == "real content"
    # the footer's <p> is chrome, not content
    assert "example.org" not in joined


def test_unterminated_script_rejected():
    with pytest.raises(ValueError, match="unterminated"):
        wt.extract_main_text("<script>var x = 1;")


def test_unbalanced_container_rejected():
    with pytest.raises(ValueError, match="unbalanced"):
        wt.extract_main_text("<body></nav></body>")
    with pytest.raises(ValueError, match="unbalanced"):
        wt.extract_main_text("<body><footer>x</body>")


def test_attr_parse():
    assert wt._parse_attrs(' lang="en" id="main"') == {"lang": "en", "id": "main"}
    assert wt._parse_attrs(" checked data-x=7") == {"checked": "", "data-x": "7"}


# ---------------------------------------------------------------------------
# WARC framing
# ---------------------------------------------------------------------------


def test_warc_record_roundtrip():
    rec = w.build_response_record(42, b"hello body", "text/plain; charset=utf-8")
    headers, block = w.parse_warc_record(rec)
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == f"{w.URI_PREFIX}42"
    status, http_headers, body = w.parse_http_response(block)
    assert status == 200
    assert http_headers["content-length"] == "10"
    assert body == b"hello body"


def test_warc_bad_version_rejected():
    with pytest.raises(ValueError, match="version"):
        w.parse_warc_record(b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="bad WARC version line"):
        w.parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\n")


def test_warc_length_and_terminator_enforced():
    rec = bytearray(w.build_response_record(1, b"abc", "text/plain"))
    # grow the block without touching Content-Length
    with pytest.raises(ValueError, match="content-length"):
        w.parse_warc_record(bytes(rec[:-4] + b"X" + b"\r\n\r\n"))
    # clobber the terminator
    with pytest.raises(ValueError, match="terminator"):
        w.parse_warc_record(bytes(rec[:-4] + b"\r\nXX"))


def test_http_length_mismatch_rejected():
    block = b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nabc"
    with pytest.raises(ValueError, match="content-length"):
        w.parse_http_response(block)


def test_gzip_member_walk():
    from kafka_streams_common_spark.operators.archive import _gzip_compress_bytes

    shard = b"".join(_gzip_compress_bytes(p) for p in (b"one", b"two", b"three"))
    assert list(w.split_gzip_members(shard)) == [b"one", b"two", b"three"]
    with pytest.raises(Exception):
        list(w.split_gzip_members(shard[:-5]))


def test_member_crc_verified():
    from kafka_streams_common_spark.operators.archive import _gzip_compress_bytes

    m = bytearray(_gzip_compress_bytes(b"payload"))
    m[-6] ^= 0xFF  # flip a CRC byte
    with pytest.raises(Exception):
        list(w.split_gzip_members(bytes(m)))


# ---------------------------------------------------------------------------
# Spark end to end
# ---------------------------------------------------------------------------


def _docs_df(spark, n=12):
    rows = [
        (i, f"body text {i} " + "x" * (i * 37 % 300), ["en", "de"][i % 2])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_spark_warc_ingest(spark):
    docs = _docs_df(spark)
    shards = w.encode_warc_shards(docs, n_shards=4)
    srows = shards.collect()
    assert len(srows) == 4
    assert all(r["n_records"] == 4 for r in srows)  # warcinfo + 3 docs
    out = {r["doc_id"]: r for r in w.decode_warc_responses(shards).collect()}
    assert len(out) == 12
    body = ("body text 5 " + "x" * (5 * 37 % 300)).encode()
    assert out[5]["payload_bytes"] == len(body)
    assert out[5]["payload_md5"] == hashlib.md5(body).hexdigest()
    assert out[5]["shard_id"] == 1


def test_spark_missing_warcinfo_rejected(spark):
    import pandas as pd
    from kafka_streams_common_spark.operators.archive import _gzip_compress_bytes

    payload = _gzip_compress_bytes(w.build_response_record(1, b"x", "text/plain"))
    shards = spark.createDataFrame(
        pd.DataFrame({"shard_id": [0], "n_records": [1], "payload": [payload]})
    )
    with pytest.raises(Exception, match="warcinfo"):
        w.decode_warc_responses(shards).collect()


def test_spark_html_pipeline(spark):
    docs = _docs_df(spark)
    out = {r["doc_id"]: r for r in
           w.warc_html_extract(w.encode_warc_shards(docs, html=True)).collect()}
    assert len(out) == 12
    assert all(r["uri_id_match"] for r in out.values())
    text7 = "body text 7 " + "x" * (7 * 37 % 300)
    assert out[7]["main_md5"] == hashlib.md5(text7.encode()).hexdigest()
    assert out[7]["n_paragraphs"] == (len(text7) + 199) // 200


def test_warc_missing_content_length_rejected():
    raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with pytest.raises(ValueError, match="missing Content-Length"):
        w.parse_warc_record(raw)
