"""Web-scrape ingest queries: WARC shard walk (the Common Crawl
container), HTML main-content extraction, and the composed
crawl-to-corpus pipeline — the front door of a 100 TB text pipeline,
on the fixture-derivation pattern: payloads are built deterministically
from ``documents`` rows, so the SQL oracle replays every recovered
column and the hash gates the container walk + the extraction end to
end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_common_spark.queries.registry import query, table


@query(
    "web_warc_ingest",
    oracle="""
    SELECT doc_id,
           CAST(200 AS INT) AS http_status,
           'text/plain; charset=utf-8' AS content_type,
           CAST(strlen(text) AS BIGINT) AS payload_bytes,
           md5(text) AS payload_md5,
           CAST(doc_id % 16 AS BIGINT) AS shard_id
    FROM documents
    """,
)
def web_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC shard ingest (r14) — documents are written into genuine
    ISO 28500 shards (leading warcinfo record, one HTTP-response
    record per doc, every record its own RFC 1952 gzip member with a
    real CRC-32 + ISIZE trailer, WARC and HTTP Content-Lengths both
    exact) and walked back by ``operators/warc.decode_warc_responses``
    — member split, header parse, length + terminator verification,
    warcinfo skip, HTTP parse, id recovery from the target URI. The
    oracle replays status, content type, byte count, payload md5 and
    shard id from ``documents``, so a mis-measured header, a swallowed
    record, or a wrong member boundary breaks the hash. One
    shard-forming shuffle on encode; ingest is map-only."""
    from kafka_streams_common_spark.operators.warc import (
        decode_warc_responses,
        encode_warc_shards,
    )

    docs = table(spark, sf_dir, "documents")
    return decode_warc_responses(encode_warc_shards(docs))


@query(
    "web_html_extract",
    oracle="""
    SELECT doc_id,
           'Doc ' || doc_id || ' <' || lang || '> & "notes"' AS title,
           lang,
           md5(text) AS main_md5,
           CAST(strlen(text) AS BIGINT) AS main_chars,
           CAST(ceil(strlen(text) / 200.0) AS INT) AS n_paragraphs,
           CAST(doc_id % 3 + 5 AS INT) AS n_links
    FROM documents
    """,
)
def web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction (r14) — each document is rendered
    as a deterministic page (escaped title PLANTED with ``< > & "``
    characters, nav/aside/footer link chrome, a <script> whose string
    literal contains ``<p>`` markup — the raw-text trap — a comment
    with more fake markup, and the text chunked into 200-char
    ``<p>`` blocks inside ``div id="main"``), shipped WITHOUT an id
    column; ``operators/webtext.extract_docs_main_text`` walks the
    page once (script/style consumed wholesale, boilerplate containers
    suppressed, character references decoded, anchors counted) and
    must recover the id from the <h1>, the exact title, and the exact
    text — ``main_md5 = md5(text)`` leaves no slack for a dropped
    character, an unstripped tag, or a mis-decoded entity. Map-only
    Arrow stages both directions; interchange with stdlib
    html.escape/unescape pinned in pytest."""
    from kafka_streams_common_spark.operators.webtext import (
        extract_docs_main_text,
        render_docs_html,
    )

    docs = table(spark, sf_dir, "documents")
    return extract_docs_main_text(render_docs_html(docs))


@query(
    "web_warc_html_pipeline",
    oracle="""
    SELECT doc_id,
           CAST(1 AS BOOLEAN) AS uri_id_match,
           md5(text) AS main_md5,
           CAST(ceil(strlen(text) / 200.0) AS INT) AS n_paragraphs
    FROM documents
    """,
)
def web_warc_html_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl-to-corpus path (r14): rendered HTML inside
    genuine WARC shards, then ONE map-only ingest stage does the whole
    walk — gzip members, WARC headers, HTTP parse, HTML extraction —
    with the URI-recovered id cross-checked against the id the
    article's <h1> carries (the two travel through different layers;
    ``uri_id_match`` must be uniformly true and is oracle-gated). This
    is the operator a Common Crawl reader actually runs per shard at
    production scale."""
    from kafka_streams_common_spark.operators.warc import (
        encode_warc_shards,
        warc_html_extract,
    )

    docs = table(spark, sf_dir, "documents")
    return warc_html_extract(encode_warc_shards(docs, html=True))
