#!/usr/bin/env python3
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The LAST
stdout line is the headline JSON: {"metric": "headline_queries_total_sec",
"value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...};
one preceding line carries the FYI tracking rows (kept separate so a
tail-capture or last-line parse always gets an intact headline — the
round-8 single-line output was clipped by the driver's capture).

Protocol (BASELINE.md): 1 warm-up + 3 timed runs per query, median recorded.
Timing writes the full result to the noop sink, which materializes EVERY
output column — a count() action would let Catalyst prune per-row
projections and understate map-shaped queries. The Spark cache is cleared
before each timed run so operator-internal .cache() calls (legitimate
within one query) cannot leak work across runs; results are not collected
to the driver — we measure engine throughput, not pandas transfer.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from kafka_streams_common_spark.queries import QUERIES
from kafka_streams_common_spark.session import get_spark

BENCH_QUERIES = [
    # reference-parity core
    "j5_enrichment_chain",       # J5 join chain (orders ⟕ customer ⟕ nation)
    "a1_count_by_key",           # A1 group-by count
    "p4_json_parse_agg",         # P4 JSON parse + agg over events.props
    "s2_latest_per_key",         # S2 changelog latest-per-key view
    # analytical shapes
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "window_topk_orders_per_customer",
    # extension operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_apply_canonical_corpus",
    "sim_cosine_topk",
    "sim_embedding_near_dup",
    "sim_ivf_topk",
    "text_quality_metrics",
    "text_tfidf_top_terms",
    "dedup_decontaminate",
]

# TRACKING, NOT BUDGET — the post-r2 operators. This second table exists
# so perf drift in the newer half of the repo is visible per round (the
# frozen 17-query set above is the graded budget and is never edited;
# these rows carry no frozen per-query ceiling and may gain entries as
# operators land). See BASELINE.md "Tracking table".
TRACKING_QUERIES = [
    "dedup_passages",
    "dedup_lines",
    "dedup_ngram_jaccard",
    "pipeline_curate_corpus",
    "sim_semantic_dedup_apply",
    "sim_diverse_cell_sample",
    "sim_ivf_int8_rerank",
    "sim_ivf_pq_rerank",
    "text_bigram_logprob",
    "text_perplexity_filter",
    "llm_mix_corpus_tokens",
    "events_funnel_conversion",
    "events_funnel_stage_counts",
    "events_funnel_time_to_convert",
    # session-2 governance/chunking/JL tier
    "dq_profile_events",
    "dq_constraints_orders",
    "scd2_user_event_history",
    "join_salted_skew_events",
    "text_chunk_documents",
    "sim_random_projection",
    "window_range_moving_avg",
    "events_zscore_outliers",
    "text_corpus_report_rollup",
    "text_bpe_top_pairs",
    "agg_histogram_totalprice",
    "stat_corr_price_linecount",
    "text_classifier_score",
    "llm_temperature_sample_sources",
    "s2_cdc_apply_tombstones",
    "stat_regression_tokens_by_source",
    "agg_hll_mergeable_rollup",
    "text_normalize",
    "text_url_canonicalize",
    "window_trending_topk",
    "asof_join_next_order_after_event",
    "scd2_temporal_lookup",
    # round-8 additions (streaming rows stay off this table like the
    # rest of the streaming tier — foreachBatch state dirs per run)
    "dq_profile_events_approx",
    "dedup_decontaminate_bloom",
    "dedup_connected_components_two_phase",
    "graph_pagerank_customer_supplier",
    "llm_dsir_importance_weights",
    "zorder_key_orders",
    # round-8 session-2/3 additions
    "er_fuzzy_match_part_names",
    "attribution_linear_credit",
    "events_cohort_retention",
    "graph_triangle_count_copurchase",
    "cdc_snapshot_diff_orders",
    "events_top_paths",
    "events_activity_gaps",
    "events_concurrency_sweep",
    "events_cumulative_distinct_users",
    "events_markov_transitions",
    "customer_rfm_segments",
    "basket_part_pair_lift",
    "timeseries_gapfill_events",
    "stat_mad_outliers",
    "dq_benford_first_digit",
    "sim_mmr_diversified_topk",
    "dedup_soft_weights",
    "events_ohlc_daily",
    "graph_link_prediction_jaccard",
    "text_ngram_novelty",
    "events_type_overlap_matrix",
    "window_percent_change_daily",
    "timeseries_cusum_change",
    "timeseries_dow_seasonality",
    "sim_knn_label_accuracy",
    "dedup_containment_pairs",
    "customer_revenue_concentration",
    "agg_countmin_heavy_hitters",
    "stat_chi2_event_type_dow",
    # round-8 session-4 additions
    "ab_test_proportion_ztest",
    "timeseries_ewma_daily_by_type",
    "timeseries_twap_value_daily",
    "graph_bfs_hops_copurchase",
    "eval_classifier_auc",
    "eval_calibration_bins",
    "text_bm25_search",
    "dq_quarantine_bad_records",
    "eval_confusion_threshold",
    "dq_drift_ks_totalprice",
    "timeseries_autocorr_daily",
    "eval_score_length_spearman",
    "geo_radius_join_customers",
    "events_pattern_match_sequence",
    "merge_upsert_user_state",
    "bucketed_join_orders_lineitem",
    "agg_approx_percentile_value",
    # round-9 additions
    "er_fuzzy_match_brand_ngram",
    "llm_token_budget_shards",
    "timeseries_holt_trend_daily",
    "dedup_incremental_vs_corpus",
    "sink_partitioned_overwrite_day",
    "source_schema_evolution_mergeread",
    "sim_incremental_near_dup_vs_corpus",
    "eval_pr_curve",
    # round-11 additions
    "multimodal_feature_extract",
    "multimodal_ahash_near_dup",
    "multimodal_audio_features",
    "multimodal_video_scene_stats",
    "multimodal_format_census",
    # r12: the compressed-PNG branch and the audio near-dup join
    "multimodal_png_decode",
    "multimodal_audio_near_dup",
    # r12 second wave: μ-law companded audio, GIF LZW, video near-dup,
    # baseline JPEG
    "multimodal_mulaw_audio_decode",
    "multimodal_gif_decode",
    "multimodal_video_near_dup",
    "multimodal_jpeg_recon",
    # r13: color JPEG, the cross-modal dedup composition, the kNN graph
    # and its SemDeDup consumer
    "multimodal_jpeg_color_recon",
    "multimodal_cross_modal_dedup",
    "sim_knn_graph",
    "sim_semantic_dedup",
    "multimodal_g711_mixed_decode",
    "multimodal_gif_anim_scene_stats",
    "multimodal_png_palette_decode",
    "multimodal_jpeg_progressive_recon",
    "multimodal_color_image_decode",
    # r14: alpha/16-bit PNG, frame-diffed GIF, planted-τ SemDeDup,
    # EXIF extraction, gzip text lake, WebDataset tar shards
    "multimodal_png_alpha_decode",
    "multimodal_gif_composite_stats",
    "sim_semantic_dedup_planted",
    "multimodal_exif_metadata",
    "multimodal_gzip_text_ingest",
    "multimodal_webdataset_ingest",
    # r14 second wave: zip bundles, BMP, MP3 metadata, encoding census
    "multimodal_zip_bundle_ingest",
    "multimodal_bmp_decode",
    "multimodal_mp3_metadata",
    "text_encoding_census",
    # r14 third wave: Kafka serdes, web-scrape ingest, metadata breadth
    "kafka_avro_ocf_roundtrip",
    "kafka_confluent_avro_decode",
    "kafka_protobuf_decode",
    "web_warc_ingest",
    "web_html_extract",
    "web_warc_html_pipeline",
    "multimodal_flac_metadata",
    "multimodal_mp3_id3v2_tags",
    "multimodal_tiff_decode",
    # r14 wave 3b: Avro collection wire forms, MP4 box walk
    "kafka_avro_map_decode",
    "multimodal_mp4_metadata",
    # r14 wave 3c: Ogg pages + subtitle sidecars
    "multimodal_ogg_metadata",
    "multimodal_subtitle_cues",
    # r14 wave 3d: schema-less binary serdes
    "kafka_msgpack_decode",
    "kafka_cbor_decode",
    # r14 wave 4: source-format breadth, compressed-text codecs, thrift,
    # FLAC audio frames, parquet footer walk
    "source_orc_roundtrip_nation",
    "multimodal_bz2_xz_text_ingest",
    "kafka_thrift_decode",
    "multimodal_flac_audio_decode",
    "source_parquet_footer_walk",
    "source_orc_footer_walk",
]

# Streaming-stateful tracking rows (r11, VERDICT r10 item 6): the
# applyInPandasWithState ladder had no per-round perf visibility. Each
# run executes the FULL bounded stream (fresh temp checkpoint/state dirs
# per invocation inside the query, availableNow to completion), so these
# time end-to-end micro-batch execution, not just a batch plan — kept in
# a separate list with 1 warm-up + 3 timed runs like everything else.
STREAMING_TRACKING_QUERIES = [
    "streaming_temporal_asof_join",
    "streaming_ewma_value",
    "streaming_holt_trend",
    # r11: the multimodal decode gate on the stream
    "streaming_multimodal_ingest",
    # r12 wave 2: compressed decode inside micro-batches
    "streaming_compressed_ingest",
    # r14 wave 3: schema-registry decode + routing inside micro-batches
    "streaming_confluent_ingest",
]

# Frozen per-query ceilings for the heavy tracking tier (re-adjudicated
# r16 optimization round): ceiling = max(2.5× the idle-probe median,
# 2.5× the worst CLEAN full-bench in-sequence median) — BASELINE.md
# §"Frozen tracking ceilings". The optimization round's two full
# benches on an idle host measured the per-row-kernel tier reading
# 1.5-3.3× its fresh-session level IN SEQUENCE (sustained across all 3
# timed runs, cause environmental, not code — fresh-session re-probes
# of the same rows read at idle levels minutes later), so an idle-only
# anchor false-positives: the previous 2.5 s floor left bz2/OCF/msgpack
# at 1.07-1.40× margin and one contaminated run DID exit 3 on rows
# whose code had not changed. The driver-visible gate must never
# false-positive; the per-round ≥1.4× drift adjudication protocol
# (idle probes) remains the SENSITIVE regression detector, the rc=3
# ceiling is the coarse backstop for order-of-magnitude slides. A
# breach is emitted under "ceiling_breaches" and FAILS the run (exit
# 3). Re-freezing requires an adjudication entry in BASELINE.md.
TRACKING_CEILINGS = {
    "multimodal_jpeg_recon": 4.1,
    "multimodal_jpeg_color_recon": 3.5,
    "multimodal_jpeg_progressive_recon": 3.0,
    "sim_semantic_dedup_planted": 12.5,
    # the r16 fan_out tier — idle medians 0.48-0.91 (BASELINE.md r16
    # adjudications); in-sequence clean-bench medians 0.9-2.3
    "kafka_thrift_decode": 5.0,
    "kafka_protobuf_decode": 5.0,
    "kafka_confluent_avro_decode": 5.0,
    "kafka_avro_ocf_roundtrip": 5.0,
    "kafka_avro_map_decode": 5.0,
    "kafka_msgpack_decode": 5.0,
    "kafka_cbor_decode": 5.0,
    "multimodal_flac_audio_decode": 7.7,
    "multimodal_bz2_xz_text_ingest": 6.0,
    "multimodal_gzip_text_ingest": 2.5,
    "multimodal_webdataset_ingest": 2.5,
    "multimodal_zip_bundle_ingest": 2.5,
    "multimodal_mp3_metadata": 2.5,
    "multimodal_mp3_id3v2_tags": 2.5,
    "multimodal_mp4_metadata": 2.5,
    "multimodal_flac_metadata": 2.5,
    "text_encoding_census": 3.0,
    "web_warc_ingest": 2.5,
    "web_html_extract": 2.5,
    "web_warc_html_pipeline": 2.5,
    "dedup_incremental_vs_corpus": 15.0,
    "sim_incremental_near_dup_vs_corpus": 11.2,
    "streaming_holt_trend": 11.5,
    "streaming_temporal_asof_join": 24.4,
    "streaming_ewma_value": 11.5,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # SESSION warm-up (r8, documented in BASELINE.md): one throwaway
    # query so the first benched query's own warm-up run isn't also
    # paying whole-session JVM/JIT/codegen/file-listing costs — the
    # first-position inflation diagnosed on j5_enrichment_chain (its
    # isolated median equals its frozen row; in-sequence it read 1.2-
    # 1.35× purely from leading the list).
    QUERIES["tpch_q1_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    results: dict[str, float] = {}
    def run(fn) -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def clear_state() -> None:
        # drop cached plans AND pinned localCheckpoint RDDs (operators
        # legitimately checkpoint tiny intermediates; they must not
        # accumulate in the block manager across timed runs)
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(False)

    def bench_set(names: list[str], out: dict[str, float]) -> None:
        for name in names:
            fn = QUERIES[name]
            run(fn)  # warm-up (JIT, file listing, broadcast)
            times = []
            for _ in range(3):
                clear_state()
                t0 = time.perf_counter()
                run(fn)
                times.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(times), 3)
            print(f"# {name}: {out[name]}s", file=sys.stderr)

    bench_set(BENCH_QUERIES, results)
    tracking: dict[str, float] = {}
    bench_set(TRACKING_QUERIES, tracking)
    bench_set(STREAMING_TRACKING_QUERIES, tracking)
    total = round(sum(results.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Two lines, tracking FIRST and headline LAST: the grading driver
    # tail-captures stdout, and in round 8 the single ever-growing line
    # was clipped mid-way, losing the headline ("parsed": null in
    # BENCH_r08.json). The headline line is small and final, so it
    # survives both a tail capture and a last-line parse; the tracking
    # rows (frozen ceilings for the heavy tier since r15, FYI-only for
    # the rest — BASELINE.md "Tracking table" / "Frozen tracking
    # ceilings") ride on their own sacrificial first line.
    breaches = {
        n: {"sec": tracking[n], "ceiling": c}
        for n, c in TRACKING_CEILINGS.items()
        if n in tracking and tracking[n] > c
    }
    print(
        json.dumps(
            {
                "metric": "tracking_queries_total_sec",
                "value": round(sum(tracking.values()), 3),
                "unit": "sec",
                "tracking": tracking,
                "ceiling_breaches": breaches,
                "sf": sf,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "tracking_total_sec": round(sum(tracking.values()), 3),
            }
        )
    )
    if breaches:
        print(f"# CEILING BREACH: {breaches}", file=sys.stderr)
        sys.exit(3)


if __name__ == "__main__":
    main()
