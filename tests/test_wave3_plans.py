"""Plan-shape pins for the r14 wave-3 tiers: every per-row codec
pipeline must stay MAP-ONLY (no Exchange anywhere in the executed
plan) — the property that makes the 100 TB posture real. The two
container-forming paths (OCF, WARC) are pinned to exactly ONE
exchange: the container-key shuffle and nothing else."""

from __future__ import annotations

import pytest


def _docs(spark, n=6):
    return spark.createDataFrame(
        [(i, f"plan doc {i} body", ["en", "de"][i % 2]) for i in range(n)],
        "doc_id long, text string, lang string",
    )


def _events(spark, n=6):
    return spark.createDataFrame(
        [(i, f'{{"k": {i}}}', f"t{i % 2}", float(i), 500 + i) for i in range(n)],
        "event_id long, props string, event_type string, value double, user_id long",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _map_only_pipelines(spark):
    from kafka_streams_common_spark.operators import (
        avro,
        flac,
        mp4,
        mpeg_audio,
        ogg,
        protowire,
        subtitles,
        tiff,
        webtext,
    )

    docs, events = _docs(spark), _events(spark)
    return {
        "confluent": avro.decode_events_confluent(
            avro.encode_events_confluent(events)
        ),
        "avro_map": avro.decode_events_avro_props(
            avro.encode_events_avro_props(events)
        ),
        "protobuf": protowire.decode_events_proto(
            protowire.encode_events_proto(events)
        ),
        "html": webtext.extract_docs_main_text(webtext.render_docs_html(docs)),
        "flac": flac.decode_flac_meta(flac.encode_flac_meta(docs)),
        "id3v2": mpeg_audio.decode_mp3_id3v2(mpeg_audio.encode_mp3_id3v2(docs)),
        "tiff": tiff.decode_tiff_features(tiff.encode_tiff(docs)),
        "mp4": mp4.decode_mp4_meta(mp4.encode_mp4_meta(docs)),
        "ogg": ogg.decode_ogg_meta(ogg.encode_ogg_meta(docs)),
        "subtitles": subtitles.decode_subtitles(subtitles.encode_subtitles(docs)),
    }


@pytest.mark.parametrize(
    "name",
    [
        "confluent",
        "avro_map",
        "protobuf",
        "html",
        "flac",
        "id3v2",
        "tiff",
        "mp4",
        "ogg",
        "subtitles",
    ],
)
def test_per_row_codec_pipelines_are_map_only(spark, name):
    plan = _plan(_map_only_pipelines(spark)[name])
    assert "Exchange" not in plan, f"{name} plan gained a shuffle:\n{plan}"


def test_container_forming_paths_have_exactly_one_exchange(spark):
    from kafka_streams_common_spark.operators import avro, warc

    orders = spark.createDataFrame(
        [(k, k, float(k), "O", "P") for k in range(1, 9)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string",
    )
    ocf = avro.decode_orders_ocf(avro.encode_orders_ocf(orders, n_containers=4))
    assert _plan(ocf).count("Exchange") == 1

    shards = warc.decode_warc_responses(warc.encode_warc_shards(_docs(spark), 4))
    assert _plan(shards).count("Exchange") == 1
