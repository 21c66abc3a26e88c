#!/usr/bin/env python3
"""Scale probe — empirical evidence that the dedup/similarity operators
scale near-linearly in corpus size, including under heavy duplication.

Builds an 8× corpus by unioning the sf0.1 fixture with id-offset copies —
deliberately the ADVERSARIAL shape for dedup (every document now has 8
exact copies, so every LSH bucket really collides and every candidate
verifies positive), the profile of a genuinely dirty crawl corpus. A
quadratic candidate generator or an unbounded bucket would blow up here;
the banded operators should grow ~8× in time and emit C(8,2)=28 pairs per
original document.

Usage: python scripts/scale_probe.py  → one JSON line per operator with
1× and 8× wall time, output rows, and the time ratio.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.cluster import (
    connected_components,
    connected_components_two_phase,
    pagerank,
)
from kafka_streams_common_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from kafka_streams_common_spark.operators.similarity import (
    embedding_centroids,
    hyperplane_lsh_near_dup_pairs,
)
from kafka_streams_common_spark.operators.dedup import (
    bloom_decontaminate,
    decontaminate,
    line_dedup,
    passage_dedup,
)
from kafka_streams_common_spark.operators.similarity import (
    cell_diverse_sample,
    ivf_int8_rerank_topk,
    quantize_embeddings_int8,
)
from kafka_streams_common_spark.operators.bpe import (
    _initial_symbols,
    _pair_census,
    bpe_encode,
    word_frequencies,
)
from kafka_streams_common_spark.operators.profile import profile_columns
from kafka_streams_common_spark.operators.rollup import snapshot_diff
from kafka_streams_common_spark.operators.text import (
    classifier_score,
    dsir_importance_weights,
)
from kafka_streams_common_spark.operators.zorder import zorder_key
from kafka_streams_common_spark.operators.skewjoin import salted_join
from kafka_streams_common_spark.operators.text import (
    bigram_repetition,
    chunk_documents,
    gopher_quality,
    mix_corpus_by_tokens,
    pack_sequences,
    tfidf_top_terms,
    unigram_logprob,
)
from kafka_streams_common_spark.queries.registry import table
from kafka_streams_common_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
COPIES = 8


def replicate(df, id_col: str, n: int):
    """n id-offset copies of df (ids stay distinct across copies)."""
    out = df
    for k in range(1, n):
        out = out.unionAll(
            df.withColumn(id_col, F.col(id_col) + F.lit(k * 10_000_000))
        )
    return out


def timed(fn):
    t0 = time.perf_counter()
    rows = fn().count()
    return round(time.perf_counter() - t0, 2), rows


def timed_noop(fn):
    """Time a full noop-sink write (materializes EVERY output column) —
    used for map-heavy ops where count() would let Catalyst prune the
    expensive projections and understate the work."""
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    return dt, fn().count()


def main() -> None:
    spark = get_spark("scale-probe")
    docs1 = table(spark, SF_DIR, "documents")
    docs8 = replicate(docs1, "doc_id", COPIES).localCheckpoint(eager=True)
    emb1 = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    emb8 = replicate(emb1, "vec_id", COPIES).localCheckpoint(eager=True)
    ivf_queries = emb1.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    ).localCheckpoint(eager=True)
    # events replicated on event_id ONLY: user_id stays, so the 8x corpus
    # has 8x events per user — the adversarial shape for per-user windows
    # (hot partitions) and for the salted join's hot keys
    events1 = table(spark, SF_DIR, "events")
    events8 = replicate(events1, "event_id", COPIES).localCheckpoint(eager=True)
    cust = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    from pyspark.sql import Window

    def _scd2(ev):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return ev.select(
            "user_id", "event_type", "ts",
            F.lead("ts").over(w).alias("valid_to"),
        )

    def _moving(ev):
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").cast("long"))
            .rangeBetween(-3600, 0)
        )
        return ev.select(
            "event_id",
            F.sum(F.round("value", 6).cast("decimal(18,6)")).over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        )

    def _zscore(ev):
        stats = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("s"),
            F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,12)"))
            .cast("double").alias("sq"),
        )
        m = stats.select(
            "event_type",
            (F.col("s") / F.col("n")).alias("mean"),
            F.sqrt(F.greatest(F.col("sq") / F.col("n")
                   - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                   F.lit(0.0))).alias("std"),
        )
        z = (F.col("value") - F.col("mean")) / F.col("std")
        return (
            ev.join(F.broadcast(m), "event_type")
            .select("event_id", z.alias("z"))
            .filter(F.abs(F.col("z")) > 2.5)
        )

    probes = {
        "exact_dedup": (
            lambda: exact_dedup(docs1),
            lambda: exact_dedup(docs8),
        ),
        "minhash_lsh_pairs": (
            lambda: minhash_lsh_pairs(docs1),
            lambda: minhash_lsh_pairs(docs8),
        ),
        "simhash_pairs": (
            lambda: simhash_pairs(docs1),
            lambda: simhash_pairs(docs8),
        ),
        "hyperplane_near_dup": (
            lambda: hyperplane_lsh_near_dup_pairs(emb1, tau=0.95, dim=64),
            lambda: hyperplane_lsh_near_dup_pairs(emb8, tau=0.95, dim=64),
        ),
        "connected_components": (
            lambda: connected_components(
                docs1.select("doc_id"), minhash_lsh_pairs(docs1)
            ),
            lambda: connected_components(
                docs8.select("doc_id"), minhash_lsh_pairs(docs8)
            ),
        ),
        "tfidf_top_terms": (
            lambda: tfidf_top_terms(docs1),
            lambda: tfidf_top_terms(docs8),
        ),
        "bigram_repetition": (
            lambda: bigram_repetition(docs1),
            lambda: bigram_repetition(docs8),
        ),
        # benchmark side fixed (an eval suite doesn't grow with the
        # corpus); only the corpus scales
        "decontaminate": (
            lambda: decontaminate(docs1, docs1.limit(100).localCheckpoint(eager=True)),
            lambda: decontaminate(docs8, docs1.limit(100).localCheckpoint(eager=True)),
        ),
        "embedding_centroids": (
            lambda: embedding_centroids(emb1.withColumn("label", F.col("vec_id") % 10)),
            lambda: embedding_centroids(emb8.withColumn("label", F.col("vec_id") % 10)),
        ),
        # vectorized big–small packing: per-group work must stay linear
        "pack_sequences": (
            lambda: pack_sequences(docs1, budget_tokens=300, n_groups=64),
            lambda: pack_sequences(docs8, budget_tokens=300, n_groups=64),
        ),
        # line-frequency shuffle carries md5 digests; duplication is the
        # adversarial case (every line in 8 docs → everything drops)
        "line_dedup": (
            lambda: line_dedup(docs1, delimiter=". "),
            lambda: line_dedup(docs8, delimiter=". "),
        ),
        "unigram_logprob": (
            lambda: unigram_logprob(docs1),
            lambda: unigram_logprob(docs8),
        ),
        # pure map-only scan — the ratio should track raw input bytes
        "quantize_int8": (
            lambda: quantize_embeddings_int8(emb1),
            lambda: quantize_embeddings_int8(emb8),
        ),
        # map-only rule battery — ratio should track corpus bytes
        "gopher_quality": (
            lambda: gopher_quality(docs1),
            lambda: gopher_quality(docs8),
        ),
        # int8-space IVF + broadcast re-rank: query set fixed, corpus 8×;
        # the duplicated corpus is adversarial for the shortlist window
        # (every vector has 8 copies competing at identical scores)
        "ivf_int8_rerank": (
            lambda: ivf_int8_rerank_topk(emb1, ivf_queries, k=10),
            lambda: ivf_int8_rerank_topk(emb8, ivf_queries, k=10),
        ),
        # duplication is maximally adversarial: every window in 8 docs →
        # every token drops, the hot-window coverage explode is total
        "passage_dedup": (
            lambda: passage_dedup(docs1, k=8),
            lambda: passage_dedup(docs8, k=8),
        ),
        # one scalar agg + broadcast rate filter — should track scan bytes
        "mix_corpus_tokens": (
            lambda: mix_corpus_by_tokens(
                docs1.withColumn("lang", F.col("doc_id") % 3), {0: 20000, 1: 20000}
            ),
            lambda: mix_corpus_by_tokens(
                docs8.withColumn("lang", F.col("doc_id") % 3), {0: 20000, 1: 20000}
            ),
        ),
        # broadcast assignment + per-cell window (16 cells at any scale)
        "cell_diverse_sample": (
            lambda: cell_diverse_sample(emb1, n_per_cell=8),
            lambda: cell_diverse_sample(emb8, n_per_cell=8),
        ),
        # Bloom prefilter: benchmark (and its 128 KiB bitset) fixed,
        # corpus 8× — duplication makes every copy a candidate, the
        # adversarial case for the exact-verify stage
        "bloom_decontaminate": (
            lambda: bloom_decontaminate(
                docs1, docs1.limit(100).localCheckpoint(eager=True)
            ),
            lambda: bloom_decontaminate(
                docs8, docs1.limit(100).localCheckpoint(eager=True)
            ),
        ),
        # two-phase CC on the same duplicated near-clique graph the
        # propagation probe uses — round count must stay flat
        "connected_components_two_phase": (
            lambda: connected_components_two_phase(
                docs1.select("doc_id"), minhash_lsh_pairs(docs1)
            ),
            lambda: connected_components_two_phase(
                docs8.select("doc_id"), minhash_lsh_pairs(docs8)
            ),
        ),
        # target-domain model fixed; corpus (and its bucket counts) 8×
        "dsir_importance_weights": (
            lambda: dsir_importance_weights(
                docs1, docs1.filter("lang = 'en'")
            ),
            lambda: dsir_importance_weights(
                docs8, docs8.filter("lang = 'en'")
            ),
        ),
        # 8× edge multiplicity on the same node set: the distinct
        # collapse + 3 fixed iterations must track input size
        "pagerank_3iter": (
            lambda: pagerank(
                events1.select(
                    F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
                    F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
                ).unionAll(
                    events1.select(
                        F.concat(F.lit("t"), F.col("event_type")).alias("src"),
                        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("dst"),
                    )
                )
            ),
            lambda: pagerank(
                events8.select(
                    F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
                    F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
                ).unionAll(
                    events8.select(
                        F.concat(F.lit("t"), F.col("event_type")).alias("src"),
                        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("dst"),
                    )
                )
            ),
        ),
    }

    from kafka_streams_common_spark.operators.bpe import bpe_train

    _BPE_MERGES = [
        (l, r) for l, r, _ in bpe_train(docs1, n_merges=16)
    ]

    noop_probes = {
        "profile_columns_events": (
            lambda: profile_columns(events1),
            lambda: profile_columns(events8),
        ),
        "salted_join_8buckets": (
            lambda: salted_join(events1, cust, "user_id", "event_id", 8),
            lambda: salted_join(events8, cust, "user_id", "event_id", 8),
        ),
        "scd2_intervals": (lambda: _scd2(events1), lambda: _scd2(events8)),
        "range_moving_agg_1h": (
            lambda: _moving(events1),
            lambda: _moving(events8),
        ),
        "zscore_outliers": (
            lambda: _zscore(events1),
            lambda: _zscore(events8),
        ),
        "chunk_documents": (
            lambda: chunk_documents(docs1),
            lambda: chunk_documents(docs8),
        ),
        "classifier_score": (
            lambda: classifier_score(docs1),
            lambda: classifier_score(docs8),
        ),
        # scalar min/max agg + map-only interleave — should track bytes
        "zorder_key_events": (
            lambda: zorder_key(events1, ["user_id", "value"]),
            lambda: zorder_key(events8, ["user_id", "value"]),
        ),
        # fixed merge table; 8x corpus duplicates WORDS, so the encoded
        # vocabulary is identical — apply-side cost must track the scan
        # + join, never merges x corpus
        # key-keyed full outer diff: 8x rows on both sides, change set
        # (every 7th key rewritten, 10% membership churn) scales with
        # the keys — output stays change-volume-sized
        "snapshot_diff_events": (
            lambda: snapshot_diff(
                events1.filter(F.col("event_id") % 10 != 0)
                .select("event_id", "event_type", "value"),
                events1.filter(F.col("event_id") % 10 != 1)
                .select(
                    "event_id",
                    F.when(F.col("event_id") % 7 == 0, F.lit("X"))
                    .otherwise(F.col("event_type")).alias("event_type"),
                    "value",
                ),
                ["event_id"],
            ),
            lambda: snapshot_diff(
                events8.filter(F.col("event_id") % 10 != 0)
                .select("event_id", "event_type", "value"),
                events8.filter(F.col("event_id") % 10 != 1)
                .select(
                    "event_id",
                    F.when(F.col("event_id") % 7 == 0, F.lit("X"))
                    .otherwise(F.col("event_type")).alias("event_type"),
                    "value",
                ),
                ["event_id"],
            ),
        ),
        "bpe_encode_16merges": (
            lambda: bpe_encode(
                docs1, _BPE_MERGES, checkpoint_every=8
            ).select("doc_id", "n_tokens"),
            lambda: bpe_encode(
                docs8, _BPE_MERGES, checkpoint_every=8
            ).select("doc_id", "n_tokens"),
        ),
        "bpe_pair_census": (
            lambda: _pair_census(_initial_symbols(word_frequencies(docs1))),
            lambda: _pair_census(_initial_symbols(word_frequencies(docs8))),
        ),
    }

    # --- round-8 session-3 query shapes (minimal inline forms of the
    # registered queries, fed the replicated corpora) ---

    from kafka_streams_common_spark.operators.rollup import (
        peak_concurrency_by_day,
    )

    def _sweep(ev):
        """events_concurrency_sweep core (operators/rollup.py)."""
        return peak_concurrency_by_day(ev)

    def _basket_pairs(li):
        """basket_part_pair_lift core: distinct baskets + equi self-join."""
        b = li.select("l_orderkey", "l_partkey").distinct()
        b2 = b.select(
            F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
        )
        return (
            b.join(b2, (b.l_orderkey == b2.o2) & (b.l_partkey < b2.p2))
            .groupBy("l_partkey", "p2")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _first_touch(ev):
        """events_cumulative_distinct_users core: first-seen rewrite."""
        fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
        return fs.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))

    def _markov(ev):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            ev.select(
                "event_type", F.lead("event_type").over(w).alias("nxt")
            )
            .filter(F.col("nxt").isNotNull())
            .groupBy("event_type", "nxt")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    lineitem1 = table(spark, SF_DIR, "lineitem")
    lineitem8 = replicate(lineitem1, "l_orderkey", COPIES).localCheckpoint(
        eager=True
    )

    from kafka_streams_common_spark.operators.similarity import (
        mmr_diversified_topk,
    )
    from kafka_streams_common_spark.operators.dedup import _hashed_shingles

    def _novelty(docs):
        sh = _hashed_shingles(docs, n=3, text_col="text", id_col="doc_id")
        dfq = sh.groupBy(F.col("sh").alias("k")).agg(
            F.count(F.lit(1)).alias("df")
        )
        return (
            sh.join(dfq, sh.sh == dfq.k)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.sum((F.col("df") == 1).cast("long")).alias("n_novel"),
            )
        )

    def _overlap(ev):
        ut = ev.select("user_id", "event_type").distinct()
        b = ut.select(
            F.col("user_id").alias("u2"), F.col("event_type").alias("tb")
        )
        return (
            ut.join(b, ut.user_id == b.u2)
            .groupBy("event_type", "tb")
            .agg(F.count(F.lit(1)).alias("n_both"))
        )

    def _ohlc(ev):
        key = F.struct("ts", "event_id")
        return (
            ev.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(
                F.min_by("value", key).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", key).alias("close"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    probes.update(
        {
            "concurrency_sweep": (
                lambda: _sweep(events1),
                lambda: _sweep(events8),
            ),
            "basket_pair_lift": (
                lambda: _basket_pairs(lineitem1),
                lambda: _basket_pairs(lineitem8),
            ),
            "cumulative_distinct_users": (
                lambda: _first_touch(events1),
                lambda: _first_touch(events8),
            ),
            "markov_transitions": (
                lambda: _markov(events1),
                lambda: _markov(events8),
            ),
            "mmr_diversified_topk": (
                lambda: mmr_diversified_topk(
                    emb1, ivf_queries, k=5, shortlist=12
                ),
                lambda: mmr_diversified_topk(
                    emb8, ivf_queries, k=5, shortlist=12
                ),
            ),
            # novelty: the 8x corpus makes EVERY shingle df>=8 -> zero
            # novel shingles, the adversarial all-duplicate regime
            "ngram_novelty": (
                lambda: _novelty(docs1),
                lambda: _novelty(docs8),
            ),
            "type_overlap_matrix": (
                lambda: _overlap(events1),
                lambda: _overlap(events8),
            ),
            "ohlc_daily": (
                lambda: _ohlc(events1),
                lambda: _ohlc(events8),
            ),
        }
    )

    # --- session-4 operators: sequential recurrence, reachability,
    # ranking/eval, duration weighting, routing census ---

    from kafka_streams_common_spark.operators.cluster import bfs_hops
    from kafka_streams_common_spark.operators.timeseries import ewma
    from kafka_streams_common_spark.operators.text import (
        classifier_logit_mills,
    )

    def _ewma_user_daily(ev):
        """timeseries_ewma core, keyed per USER (150 parallel series;
        the 8x corpus has 8x the counts per day, same series shape —
        cost concentrates in the census aggregation, the designed
        dominant term)."""
        daily = ev.groupBy(
            "user_id",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        return ewma(daily, ["user_id"], "day", "n", alpha=0.25)

    def _bfs(li):
        """graph_bfs_hops core: support->=2 co-purchase edges + 3 rounds.
        Replication multiplies SUPPORT (same edge set, 8x the pair
        census input) — the edge-build join is the dominant term."""
        b = li.select("l_orderkey", "l_partkey").distinct()
        b2 = b.select(
            F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
        )
        e0 = (
            b.join(b2, (b.l_orderkey == b2.o2) & (b.l_partkey < b2.p2))
            .groupBy(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= 2)
            .select("a", "b")
        )
        bi = e0.unionAll(
            e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).localCheckpoint(eager=False)
        return bfs_hops(bi, bi.agg(F.min("a").alias("node")), max_hops=3)

    def _auc_hist(docs):
        """eval_classifier_auc core: map-only hash fold + score
        histogram + one value-bounded ordered pass."""
        scored = classifier_logit_mills(
            docs, extra_cols=((F.col("lang") == "en").alias("pos"),)
        )
        hist = scored.groupBy(F.col("logit_mills").alias("m")).agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np_s"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("nn_s"),
        )
        w = (
            Window.orderBy("m")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        c = hist.select(
            "np_s", "nn_s",
            F.coalesce(F.sum("nn_s").over(w), F.lit(0)).alias("below"),
        )
        return c.agg(
            (
                F.sum(F.col("np_s") * (2 * F.col("below") + F.col("nn_s")))
                .cast("double")
                / (2 * F.sum("np_s") * F.sum("nn_s")).cast("double")
            ).alias("auc")
        )

    def _bm25(docs):
        """text_bm25_search core (registered query against a directory;
        probe replays the plan on the replicated frame)."""
        toks = docs.select("doc_id", F.split("text", " ").alias("t"))
        base = toks.select(
            "doc_id",
            F.size("t").cast("bigint").alias("dl"),
            F.size(F.filter("t", lambda x: x == F.lit("spark")))
            .cast("bigint")
            .alias("tf"),
        )
        g = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sdl"),
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).alias("df"),
        )
        tf = F.col("tf").cast("double")
        idf = F.log(
            (F.col("n").cast("double") - F.col("df").cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        )
        avgdl = F.col("sdl").cast("double") / F.col("n").cast("double")
        return (
            base.crossJoin(F.broadcast(g))
            .filter(F.col("tf") > 0)
            .select(
                "doc_id",
                (
                    idf * tf * 2.2
                    / (tf + 1.2 * (0.25 + 0.75 * F.col("dl").cast("double") / avgdl))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), "doc_id")
            .limit(20)
        )

    def _twap(ev):
        w = Window.partitionBy("day").orderBy("ts", "event_id")
        seg = ev.select(
            F.to_date("ts").alias("day"), "ts", "event_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            F.unix_micros("ts").alias("t0"),
            F.unix_micros(
                F.date_add(F.to_date("ts"), 1).cast("timestamp")
            ).alias("day_end"),
        ).withColumn("t1", F.lead("t0").over(w))
        return (
            seg.select(
                "day", "cents",
                (F.coalesce("t1", "day_end") - F.col("t0")).alias("dur"),
            )
            .groupBy("day")
            .agg(
                (
                    F.sum(
                        F.col("cents").cast("decimal(18,0)")
                        * F.col("dur").cast("decimal(18,0)")
                    ).cast("double")
                    / F.sum("dur").cast("double")
                    / F.lit(100.0)
                ).alias("twap")
            )
        )

    def _quarantine(ev):
        valid = F.col("props").rlike('^\\{"k": -?[0-9]+\\}$')
        k = F.regexp_extract("props", '"k": (-?[0-9]+)', 1).cast("bigint")
        return ev.select(
            F.when(~valid, 1).otherwise(0).alias("bp"),
            F.when(valid & ((k >= 95) | (k < 0)), 1).otherwise(0).alias("ko"),
            F.when(F.col("value") > 300.0, 1).otherwise(0).alias("ve"),
        ).agg(
            F.sum("bp").alias("n_bp"),
            F.sum("ko").alias("n_ko"),
            F.sum("ve").alias("n_ve"),
        )

    probes.update(
        {
            "ewma_user_daily": (
                lambda: _ewma_user_daily(events1),
                lambda: _ewma_user_daily(events8),
            ),
            "bfs_hops_3": (
                lambda: _bfs(lineitem1),
                lambda: _bfs(lineitem8),
            ),
            "classifier_auc": (
                lambda: _auc_hist(docs1),
                lambda: _auc_hist(docs8),
            ),
            "bm25_topk": (
                lambda: _bm25(docs1),
                lambda: _bm25(docs8),
            ),
            "twap_daily": (
                lambda: _twap(events1),
                lambda: _twap(events8),
            ),
            "quarantine_census": (
                lambda: _quarantine(events1),
                lambda: _quarantine(events8),
            ),
        }
    )

    # distributed global prefix (operators/prefix.py) — the r9 swap for
    # every global-ordered readout. Two shapes: exact global RANK over
    # the raw corpus (the calibration-decile shape) and running SUMS
    # over a near-distinct value histogram (the KS-ECDF shape). Both
    # must grow ~linearly; the single-partition window they replace
    # grows superlinearly and, at real scale, simply dies.
    from kafka_streams_common_spark.operators.prefix import global_prefix

    def _prefix_rank(docs):
        ranked = global_prefix(
            docs.select("doc_id", F.length("text").alias("x")),
            ["x", "doc_id"],
            rank_col="rnk",
        )
        return ranked.groupBy().agg(
            F.sum("rnk").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def _prefix_ecdf(ev):
        h = ev.groupBy(F.col("value").alias("x")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        c = global_prefix(h, ["x"], sum_cols=["cnt"])
        return c.groupBy().agg(F.max("run_cnt").alias("n"))

    probes.update(
        {
            "prefix_global_rank": (
                lambda: _prefix_rank(docs1),
                lambda: _prefix_rank(docs8),
            ),
            "prefix_ecdf_sums": (
                lambda: _prefix_ecdf(events1),
                lambda: _prefix_ecdf(events8),
            ),
        }
    )

    # perceptual-hash image near-dup (r11) — same adversarial shape as
    # the text dedup probes: 8 exact copies per document ⇒ every aHash
    # band bucket really collides and every candidate verifies at
    # hamming 0 (C(8,2)=28 pairs per original). Quadratic-in-bucket
    # growth would blow up here; banded growth tracks output size.
    from kafka_streams_common_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        encode_pgm,
    )

    probes.update(
        {
            "ahash_image_near_dup": (
                lambda: ahash_near_dup_pairs(encode_pgm(docs1)),
                lambda: ahash_near_dup_pairs(encode_pgm(docs8)),
            ),
        }
    )

    # audio temporal-envelope near-dup (r12) — the same adversarial
    # duplication shape, through the WAV decode + 64-point envelope
    # kernel and the shared banded join, with the hot-bucket cap at its
    # registered-query setting.
    from kafka_streams_common_spark.operators.multimodal import (
        audio_near_dup_pairs,
    )

    probes.update(
        {
            "audio_envelope_near_dup": (
                lambda: audio_near_dup_pairs(encode_wav(docs1), max_bucket=100),
                lambda: audio_near_dup_pairs(encode_wav(docs8), max_bucket=100),
            ),
        }
    )

    # video spatio-temporal envelope near-dup (r12 second wave) — the
    # fourth modality through the same shared banded join, cap at its
    # registered-query setting.
    from kafka_streams_common_spark.operators.multimodal import (
        encode_y4m,
        video_near_dup_pairs,
    )

    probes.update(
        {
            "video_envelope_near_dup": (
                lambda: video_near_dup_pairs(encode_y4m(docs1), max_bucket=100),
                lambda: video_near_dup_pairs(encode_y4m(docs8), max_bucket=100),
            ),
        }
    )

    # PNG mixed-lake decode (r12): real DEFLATE encode → magic dispatch
    # → inflate + unfilter, map-only end to end. Expect ~linear.
    from kafka_streams_common_spark.operators.multimodal import (
        decode_image_features,
        encode_png,
    )

    def _mixed_image_lake(docs):
        return decode_image_features(
            encode_pgm(docs.filter(F.col("doc_id") % 2 == 0)).unionAll(
                encode_png(docs.filter(F.col("doc_id") % 2 == 1), level=6)
            )
        )

    noop_probes.update(
        {
            "png_mixed_lake_decode": (
                lambda: _mixed_image_lake(docs1),
                lambda: _mixed_image_lake(docs8),
            ),
        }
    )

    # GIF mixed-lake decode (r12 second wave): real variable-width LZW
    # encode → magic dispatch → LZW decode + palette map, map-only.
    from kafka_streams_common_spark.operators.gif import encode_gif

    def _compressed_image_lake(docs):
        return decode_image_features(
            encode_png(docs.filter(F.col("doc_id") % 2 == 0), level=6).unionAll(
                encode_gif(docs.filter(F.col("doc_id") % 2 == 1))
            )
        )

    # μ-law mixed-codec decode (r12 second wave): format-tag dispatch +
    # companding expansion inside the Arrow batch, map-only.
    from kafka_streams_common_spark.operators.multimodal import (
        decode_audio_codec_features,
    )

    def _mixed_codec_lake(docs):
        return decode_audio_codec_features(
            encode_wav(docs.filter(F.col("doc_id") % 2 == 0)).unionAll(
                encode_wav(docs.filter(F.col("doc_id") % 2 == 1), codec="mulaw")
            )
        )

    noop_probes.update(
        {
            "gif_compressed_lake_decode": (
                lambda: _compressed_image_lake(docs1),
                lambda: _compressed_image_lake(docs8),
            ),
            "mulaw_mixed_codec_decode": (
                lambda: _mixed_codec_lake(docs1),
                lambda: _mixed_codec_lake(docs8),
            ),
        }
    )

    # JPEG encode + decode + reconstruction report (r12 second wave):
    # DCT/Huffman both ways per row, map-only. The heaviest per-row
    # kernel in the multimodal tier — expect ~linear.
    from kafka_streams_common_spark.operators.jpeg import (
        decode_jpeg_recon_report,
        encode_jpeg,
    )

    noop_probes.update(
        {
            "jpeg_recon_report": (
                lambda: decode_jpeg_recon_report(encode_jpeg(docs1)),
                lambda: decode_jpeg_recon_report(encode_jpeg(docs8)),
            ),
        }
    )

    # real-codec decode scans (r11): encode → container parse → feature
    # extract, all map-only — the per-modality ingest shape. Expect
    # ~linear (noop-timed so the Arrow decode projections are paid).
    from kafka_streams_common_spark.operators.multimodal import (
        decode_wav_features,
        decode_y4m_frame_stats,
        encode_wav,
        encode_y4m,
    )

    noop_probes.update(
        {
            "wav_decode_features": (
                lambda: decode_wav_features(encode_wav(docs1)),
                lambda: decode_wav_features(encode_wav(docs8)),
            ),
            "y4m_decode_frame_stats": (
                lambda: decode_y4m_frame_stats(encode_y4m(docs1)),
                lambda: decode_y4m_frame_stats(encode_y4m(docs8)),
            ),
        }
    )

    # incremental (two-sided) matchers — r9: a FIXED new batch against a
    # 1×/8× indexed corpus. The per-batch cost should grow with corpus
    # bucket occupancy (sub-linear for near-unique content), never with
    # corpus² — the whole point of the two-sided form.
    from kafka_streams_common_spark.operators.dedup import minhash_lsh_match
    from kafka_streams_common_spark.operators.similarity import (
        hyperplane_lsh_match,
    )

    new_docs = docs1.filter(F.col("doc_id") % 50 == 0).localCheckpoint(
        eager=True
    )
    new_vecs = emb1.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + F.lit(50_000_000)).alias("vec_id"), "embedding"
    ).localCheckpoint(eager=True)
    probes.update(
        {
            "incremental_minhash_match": (
                lambda: minhash_lsh_match(new_docs, docs1, n=3, tau=0.8),
                lambda: minhash_lsh_match(new_docs, docs8, n=3, tau=0.8),
            ),
            "incremental_embedding_match": (
                lambda: hyperplane_lsh_match(
                    new_vecs, emb1, tau=0.95, dim=64
                ),
                lambda: hyperplane_lsh_match(
                    new_vecs, emb8, tau=0.95, dim=64
                ),
            ),
        }
    )

    # color JPEG encode + decode + recon report (r13): interleaved-MCU
    # YCbCr both ways per row (444 and 420 mixed), map-only — the
    # heaviest per-row kernel now (3 components). Expect ~linear.
    from kafka_streams_common_spark.operators.jpeg import (
        decode_jpeg_color_recon_report,
        encode_jpeg_color,
    )

    noop_probes.update(
        {
            "jpeg_color_recon_report": (
                lambda: decode_jpeg_color_recon_report(encode_jpeg_color(docs1)),
                lambda: decode_jpeg_color_recon_report(encode_jpeg_color(docs8)),
            ),
        }
    )

    # cross-modal dedup composition (r13): one 5-format lake, one decode
    # scan, one modality-scoped band join — the adversarial duplication
    # shape floods every modality's buckets simultaneously; the cap at
    # the registered-query setting bounds the modal blowup per
    # (modality, band) independently.
    from kafka_streams_common_spark.operators.multimodal import (
        cross_modal_near_dup_pairs,
    )

    def _five_format_lake(docs):
        return (
            encode_pgm(docs.filter(F.col("doc_id") % 5 == 0))
            .select("doc_id", "payload")
            .unionAll(
                encode_png(docs.filter(F.col("doc_id") % 5 == 1), level=6).select(
                    "doc_id", "payload"
                )
            )
            .unionAll(
                encode_gif(docs.filter(F.col("doc_id") % 5 == 2)).select(
                    "doc_id", "payload"
                )
            )
            .unionAll(
                encode_wav(docs.filter(F.col("doc_id") % 5 == 3)).select(
                    "doc_id", "payload"
                )
            )
            .unionAll(
                encode_y4m(docs.filter(F.col("doc_id") % 5 == 4)).select(
                    "doc_id", "payload"
                )
            )
        )

    probes.update(
        {
            "cross_modal_near_dup": (
                lambda: cross_modal_near_dup_pairs(
                    _five_format_lake(docs1), max_bucket=100
                ),
                lambda: cross_modal_near_dup_pairs(
                    _five_format_lake(docs8), max_bucket=100
                ),
            ),
        }
    )

    # kNN graph (r13): candidate volume = n_probe · |corpus| · cell_size,
    # so the 100 TB posture holds cell SIZE constant by growing the cell
    # COUNT with the corpus (64 cells at 1× → 512 at 8×, ~78 vectors per
    # cell either way) — the probe pins that the per-vector work, and so
    # total time, stays ~linear under that discipline. The centroid
    # collect is bounded by n_centroids at both scales.
    from kafka_streams_common_spark.operators.similarity import knn_graph

    probes.update(
        {
            "knn_graph": (
                lambda: knn_graph(emb1, k=8, n_centroids=64, n_probe=2),
                lambda: knn_graph(emb8, k=8, n_centroids=512, n_probe=2),
            ),
        }
    )

    # SemDeDup composition (r13): graph -> threshold -> connected
    # components -> keep list. Same cell-count-grows-with-corpus
    # discipline as the knn_graph probe; the 8x corpus is ALL
    # duplicates (8 copies per vector), the adversarial shape for the
    # clustering step — every copy family collapses into one cluster.
    from kafka_streams_common_spark.operators.similarity import semantic_dedup

    probes.update(
        {
            "semantic_dedup": (
                lambda: semantic_dedup(emb1, tau=0.35, k=8, n_centroids=64,
                                       n_probe=2),
                lambda: semantic_dedup(emb8, tau=0.35, k=8, n_centroids=512,
                                       n_probe=2),
            ),
        }
    )

    # r13 codec-breadth decode scans, all map-only — expect ~linear:
    # the full G.711 pair (three-codec dispatch + both expansions),
    # animated GIF (multi-frame LZW + GCE walk), indexed PNG (PLTE
    # lookup), and progressive JPEG (the heaviest: progressive AND
    # baseline encode + two full decodes per row for the equality gate)
    from kafka_streams_common_spark.operators.gif import (
        decode_gif_anim_frame_stats,
        encode_gif_anim,
    )
    from kafka_streams_common_spark.operators.jpeg import jpeg_progressive_report

    def _g711_lake(docs):
        return decode_audio_codec_features(
            encode_wav(docs.filter(F.col("doc_id") % 3 == 0))
            .unionAll(encode_wav(docs.filter(F.col("doc_id") % 3 == 1),
                                 codec="mulaw"))
            .unionAll(encode_wav(docs.filter(F.col("doc_id") % 3 == 2),
                                 codec="alaw"))
        )

    def _palette_lake(docs):
        return decode_image_features(
            encode_png(docs.filter(F.col("doc_id") % 2 == 0), level=6).unionAll(
                encode_png(docs.filter(F.col("doc_id") % 2 == 1), level=6,
                           indexed=True)
            )
        )

    noop_probes.update(
        {
            "g711_mixed_codec_decode": (
                lambda: _g711_lake(docs1),
                lambda: _g711_lake(docs8),
            ),
            "gif_anim_frame_stats": (
                lambda: decode_gif_anim_frame_stats(encode_gif_anim(docs1)),
                lambda: decode_gif_anim_frame_stats(encode_gif_anim(docs8)),
            ),
            "png_palette_decode": (
                lambda: _palette_lake(docs1),
                lambda: _palette_lake(docs8),
            ),
            "jpeg_progressive_report": (
                lambda: jpeg_progressive_report(docs1),
                lambda: jpeg_progressive_report(docs8),
            ),
            # r14: the registered row's equality_mod=4 form — the
            # designed cost cut; SOF columns stay corpus-wide
            "jpeg_progressive_report_sublake": (
                lambda: jpeg_progressive_report(docs1, equality_mod=4),
                lambda: jpeg_progressive_report(docs8, equality_mod=4),
            ),
        }
    )

    # r14 additions: alpha/16-bit PNG lake, frame-diffed composite GIF,
    # and SemDeDup at τ=0.9 over planted clone families (cell count
    # grown with the corpus, the knn_graph discipline)
    def _alpha_lake(docs):
        return decode_image_features(
            encode_png(docs.filter(F.col("doc_id") % 4 == 0), level=6,
                       alpha=True)
            .unionAll(encode_png(docs.filter(F.col("doc_id") % 4 == 1),
                                 level=6, channels=3, alpha=True))
            .unionAll(encode_png(docs.filter(F.col("doc_id") % 4 == 2),
                                 level=6, channels=3, alpha=True,
                                 interlaced=True))
            .unionAll(encode_png(docs.filter(F.col("doc_id") % 4 == 3),
                                 level=6, depth=16))
        )

    from kafka_streams_common_spark.operators.gif import (
        encode_gif_anim_composite,
    )

    def _planted(emb, n_centroids):
        base = emb.select("vec_id", "embedding")
        fam = base
        for k in (1, 2):
            fam = fam.unionAll(
                emb.select(
                    (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                    F.transform(
                        "embedding",
                        (lambda s: lambda x, i: x.cast("double") + F.when(
                            i == 0, F.lit(s)).otherwise(F.lit(0.0)))(k * 0.01),
                    ).alias("embedding"),
                )
            )
        return semantic_dedup(fam, tau=0.9, k=8, n_centroids=n_centroids,
                              n_probe=2, max_cell=None)

    noop_probes.update(
        {
            "png_alpha_deep_decode": (
                lambda: _alpha_lake(docs1),
                lambda: _alpha_lake(docs8),
            ),
            "gif_composite_frame_stats": (
                lambda: decode_gif_anim_frame_stats(
                    encode_gif_anim_composite(docs1)
                ),
                lambda: decode_gif_anim_frame_stats(
                    encode_gif_anim_composite(docs8)
                ),
            ),
            "semantic_dedup_planted": (
                lambda: _planted(emb1, 64),
                lambda: _planted(emb8, 512),
            ),
        }
    )

    # r14 second wave: archive containers + EXIF extraction (all
    # map-only Arrow stages — linear by construction; the probes pin it)
    from kafka_streams_common_spark.operators.archive import (
        decode_gzip_text_stats,
        decode_webdataset_pairs,
        encode_gzip_docs,
        encode_webdataset_shard,
    )
    from kafka_streams_common_spark.operators.exif import (
        decode_jpeg_exif,
        encode_jpeg_exif,
    )

    noop_probes.update(
        {
            "gzip_text_ingest": (
                lambda: decode_gzip_text_stats(encode_gzip_docs(docs1)),
                lambda: decode_gzip_text_stats(encode_gzip_docs(docs8)),
            ),
            "webdataset_ingest": (
                lambda: decode_webdataset_pairs(encode_webdataset_shard(docs1)),
                lambda: decode_webdataset_pairs(encode_webdataset_shard(docs8)),
            ),
            "jpeg_exif_metadata": (
                lambda: decode_jpeg_exif(encode_jpeg_exif(docs1)),
                lambda: decode_jpeg_exif(encode_jpeg_exif(docs8)),
            ),
        }
    )

    # r14 third wave: zip bundles, BMP, MP3 metadata, encoding census
    # (map-only Arrow stages again)
    from kafka_streams_common_spark.operators.archive import (
        decode_zip_bundles,
        encode_zip_bundles,
    )
    from kafka_streams_common_spark.operators.encoding import (
        encoding_census,
        plant_encoding_lake,
    )
    from kafka_streams_common_spark.operators.mpeg_audio import (
        decode_mp3_meta,
        encode_mp3_meta,
    )
    from kafka_streams_common_spark.operators.multimodal import (
        decode_image_features,
        encode_bmp,
    )

    noop_probes.update(
        {
            "zip_bundle_ingest": (
                lambda: decode_zip_bundles(encode_zip_bundles(docs1)),
                lambda: decode_zip_bundles(encode_zip_bundles(docs8)),
            ),
            "bmp_decode": (
                lambda: decode_image_features(encode_bmp(docs1)),
                lambda: decode_image_features(encode_bmp(docs8)),
            ),
            "mp3_metadata": (
                lambda: decode_mp3_meta(encode_mp3_meta(docs1)),
                lambda: decode_mp3_meta(encode_mp3_meta(docs8)),
            ),
            "encoding_census": (
                lambda: encoding_census(plant_encoding_lake(docs1)),
                lambda: encoding_census(plant_encoding_lake(docs8)),
            ),
        }
    )

    # r14 fourth wave: Kafka serdes (container shuffle + map decode),
    # web-scrape ingest, and the metadata-breadth codecs
    from kafka_streams_common_spark.operators.avro import (
        decode_events_confluent,
        decode_orders_ocf,
        encode_events_confluent,
        encode_orders_ocf,
    )
    from kafka_streams_common_spark.operators.flac import (
        decode_flac_meta,
        encode_flac_meta,
    )
    from kafka_streams_common_spark.operators.mpeg_audio import (
        decode_mp3_id3v2,
        encode_mp3_id3v2,
    )
    from kafka_streams_common_spark.operators.protowire import (
        decode_events_proto,
        encode_events_proto,
    )
    from kafka_streams_common_spark.operators.tiff import (
        decode_tiff_features,
        encode_tiff,
    )
    from kafka_streams_common_spark.operators.warc import (
        decode_warc_responses,
        encode_warc_shards,
        warc_html_extract,
    )
    from kafka_streams_common_spark.operators.webtext import (
        extract_docs_main_text,
        render_docs_html,
    )

    orders1 = table(spark, SF_DIR, "orders")
    orders8 = replicate(orders1, "o_orderkey", COPIES).localCheckpoint(eager=True)
    sev1 = events1.select("event_id", "event_type", "value", "user_id")
    sev8 = replicate(sev1, "event_id", COPIES).localCheckpoint(eager=True)

    noop_probes.update(
        {
            "kafka_avro_ocf": (
                lambda: decode_orders_ocf(encode_orders_ocf(orders1)),
                lambda: decode_orders_ocf(encode_orders_ocf(orders8)),
            ),
            "kafka_confluent_avro": (
                lambda: decode_events_confluent(encode_events_confluent(sev1)),
                lambda: decode_events_confluent(encode_events_confluent(sev8)),
            ),
            "kafka_protobuf": (
                lambda: decode_events_proto(encode_events_proto(sev1)),
                lambda: decode_events_proto(encode_events_proto(sev8)),
            ),
            "warc_ingest": (
                lambda: decode_warc_responses(encode_warc_shards(docs1)),
                lambda: decode_warc_responses(encode_warc_shards(docs8)),
            ),
            "html_extract": (
                lambda: extract_docs_main_text(render_docs_html(docs1)),
                lambda: extract_docs_main_text(render_docs_html(docs8)),
            ),
            "warc_html_pipeline": (
                lambda: warc_html_extract(encode_warc_shards(docs1, html=True)),
                lambda: warc_html_extract(encode_warc_shards(docs8, html=True)),
            ),
            "flac_metadata": (
                lambda: decode_flac_meta(encode_flac_meta(docs1)),
                lambda: decode_flac_meta(encode_flac_meta(docs8)),
            ),
            "mp3_id3v2": (
                lambda: decode_mp3_id3v2(encode_mp3_id3v2(docs1)),
                lambda: decode_mp3_id3v2(encode_mp3_id3v2(docs8)),
            ),
            "tiff_decode": (
                lambda: decode_tiff_features(encode_tiff(docs1)),
                lambda: decode_tiff_features(encode_tiff(docs8)),
            ),
        }
    )

    # r14 wave 3b: Avro collection wire forms + MP4 box walk
    from kafka_streams_common_spark.operators.avro import (
        decode_events_avro_props,
        encode_events_avro_props,
    )
    from kafka_streams_common_spark.operators.mp4 import (
        decode_mp4_meta,
        encode_mp4_meta,
    )

    pev1 = events1.select("event_id", "props", "event_type", "user_id")
    pev8 = replicate(pev1, "event_id", COPIES).localCheckpoint(eager=True)
    noop_probes.update(
        {
            "kafka_avro_map": (
                lambda: decode_events_avro_props(encode_events_avro_props(pev1)),
                lambda: decode_events_avro_props(encode_events_avro_props(pev8)),
            ),
            "mp4_metadata": (
                lambda: decode_mp4_meta(encode_mp4_meta(docs1)),
                lambda: decode_mp4_meta(encode_mp4_meta(docs8)),
            ),
        }
    )

    # r14 wave 3c: Ogg pages (from-scratch CRC) + subtitle sidecars
    from kafka_streams_common_spark.operators.ogg import (
        decode_ogg_meta,
        encode_ogg_meta,
    )
    from kafka_streams_common_spark.operators.subtitles import (
        decode_subtitles,
        encode_subtitles,
    )

    noop_probes.update(
        {
            "ogg_metadata": (
                lambda: decode_ogg_meta(encode_ogg_meta(docs1)),
                lambda: decode_ogg_meta(encode_ogg_meta(docs8)),
            ),
            "subtitle_cues": (
                lambda: decode_subtitles(encode_subtitles(docs1)),
                lambda: decode_subtitles(encode_subtitles(docs8)),
            ),
        }
    )

    if len(sys.argv) > 1:  # optional operator-name filter for quick re-runs
        probes = {k: v for k, v in probes.items() if k in sys.argv[1:]}
        noop_probes = {
            k: v for k, v in noop_probes.items() if k in sys.argv[1:]
        }
    for name, entry in list(probes.items()) + [
        (k, v + ("noop",)) for k, v in noop_probes.items()
    ]:
        if len(entry) == 3:
            f1, f8, _ = entry
            f1().write.format("noop").mode("overwrite").save()  # warm-up
            t1, r1 = timed_noop(f1)
            t8, r8 = timed_noop(f8)
        else:
            f1, f8 = entry
            f1().count()  # warm-up (JIT, python workers)
            t1, r1 = timed(f1)
            t8, r8 = timed(f8)
        print(
            json.dumps(
                {
                    "operator": name,
                    "t_1x_sec": t1,
                    "t_8x_sec": t8,
                    "ratio": round(t8 / t1, 1) if t1 else None,
                    "rows_1x": r1,
                    "rows_8x": r8,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
