"""Similarity-search queries over ``embeddings`` with DuckDB oracles.

Oracle cosine is spelled as an explicit sequential double fold
(``list_sum(list_transform(...))``) which reproduces Spark's
``F.aggregate``-fold bit-for-bit; DuckDB's native ``list_cosine_similarity``
accumulates differently and does NOT hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_common_spark.functions.vectors import to_double_array
from kafka_streams_common_spark.operators.similarity import (
    brute_force_cosine_topk,
    embedding_near_dup_pairs,
    hyperplane_lsh_near_dup_pairs,
    ivf_cosine_topk,
    knn_graph,
    semantic_dedup,
)
from kafka_streams_common_spark.queries.registry import query, table


def _cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(generate_series(1, len({b})),"
        f" i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return f"({dot} / ({na} * {nb}))"


def _query_set(spark: SparkSession, sf_dir: str):
    """Deterministic query subset: every 50th vector."""
    emb = table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             {_cos_sql('e.embedding', 'q.q_emb')} AS score
      FROM embeddings e, q
      WHERE q.q_id != e.vec_id
    ),
    ranked AS (
      SELECT q_id, vec_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for each query vector."""
    corpus, queries = _query_set(spark, sf_dir)
    return brute_force_cosine_topk(corpus, queries, k=10)


# The fixture embeddings top out at pairwise cosine ≈0.51 — no natural
# near-dups — so the near-dup query plants them: every vector gets a copy
# (vec_id + 1,000,000) with its FIRST component shifted by +0.01, a
# deterministic double-arithmetic perturbation both engines reproduce
# bit-for-bit (cast to DOUBLE first; DuckDB's generate_series index is
# 1-based where Spark's transform index is 0-based). Each (original, copy)
# pair sits at cosine ≈0.999; everything else stays below ≈0.52, so τ=0.95
# separates them with a wide margin on both sides.
_AUG_SQL = """
    aug AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 + CASE WHEN i = 1 THEN 0.01 ELSE 0.0 END)
      FROM embeddings
    )
"""


def _augmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", to_double_array("embedding").alias("embedding"))
    pert = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    return base.unionAll(pert)


@query(
    "sim_embedding_near_dup",
    oracle=f"""
    WITH {_AUG_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.v', 'b.v')} AS score
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.95
    """,
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at production threshold τ=0.95 via
    random-hyperplane LSH banding + exact verify (the 100 TB path: banded
    equi-join candidates, never an all-pairs join). The oracle is the
    brute-force quadratic definition (operators.similarity.
    embedding_near_dup_pairs semantics) over the same augmented corpus —
    the banded result must equal it exactly."""
    return hyperplane_lsh_near_dup_pairs(
        _augmented_corpus(spark, sf_dir), tau=0.95, dim=64
    )


@query(
    "sim_incremental_near_dup_vs_corpus",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS v
      FROM embeddings
    ),
    newb AS (
      SELECT vec_id + 1000000 AS new_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 + CASE WHEN i = 1 THEN 0.01 ELSE 0.0 END)
               AS v
      FROM embeddings
    )
    SELECT n.new_id, b.vec_id AS corpus_id,
           {_cos_sql('n.v', 'b.v')} AS score
    FROM newb n, base b
    WHERE {_cos_sql('n.v', 'b.v')} >= 0.95
    """,
)
def sim_incremental_near_dup_vs_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ingest-time SEMANTIC dedup: a simulated NEW embedding batch (the
    planted perturbed copies — each ≈0.999-cosine to one corpus vector)
    matched against the INDEXED corpus via two-sided hyperplane-LSH
    banding with exact cosine verification at τ=0.95
    (``operators/similarity.py: hyperplane_lsh_match``) — the embedding
    twin of ``dedup_incremental_vs_corpus``: candidates are new×corpus
    bucket collisions only; the corpus signature layer is what a
    production index persists, so per-batch cost is O(batch), never
    O(corpus²). Oracle is the brute-force cross-side ground truth (same
    ~2e-14 per-pair miss bound as the self-join near-dup row).

    r17 (guide §5/§6): both sides' hyperplane bits come from ONE shared
    signature pass over the union corpus (ids are disjoint by the +1e6
    offset), sliced by id — the bit kernel is row-deterministic, so each
    slice is bit-identical to recomputing that side from scratch
    (results unchanged; oracle re-proven) and the second fan_out +
    Arrow kernel + checkpoint pass disappears. The corpus-side slice
    stands in for the persisted signature index a production ingest
    pipeline reads instead of recomputing per batch."""
    from kafka_streams_common_spark.operators.similarity import (
        _hyperplane_bits_udf,
        hyperplane_lsh_match,
    )
    from kafka_streams_common_spark.operators.dedup import fan_out

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", to_double_array("embedding").alias("embedding")
    )
    new = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    sig = (
        fan_out(corpus.unionAll(new))
        .select(
            "vec_id",
            _hyperplane_bits_udf(320, 64)(
                to_double_array(F.col("embedding"))
            ).alias("sig"),
        )
        .localCheckpoint(eager=True)
    )
    return hyperplane_lsh_match(
        new,
        corpus,
        tau=0.95,
        dim=64,
        new_sigs=sig.filter(F.col("vec_id") >= 1000000),
        corpus_sigs=sig.filter(F.col("vec_id") < 1000000),
    )


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0
    ),
    cent AS (
      SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT id, v, cell FROM (
        SELECT e.vec_id AS id, e.embedding AS v, c.c_id AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.c_emb')} DESC, c.c_id
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT q_id, q_emb, cell FROM (
        SELECT q.q_id, q.q_emb, c.c_id AS cell,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY {_cos_sql('q.q_emb', 'c.c_emb')} DESC, c.c_id
               ) AS rn
        FROM q, cent c
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.q_id, a.id AS vec_id, {_cos_sql('a.v', 'p.q_emb')} AS score
      FROM assigned a JOIN probes p ON a.cell = p.cell
      WHERE p.q_id != a.id
    )
    SELECT q_id, vec_id, score FROM (
      SELECT q_id, vec_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed top-10 (16 cells, 4 probes) — the scale path.

    Approximate relative to BRUTE-FORCE top-k (recall < 1 when a true
    neighbor lives in an unprobed cell — pytest pins recall vs the exact
    baseline), but fully DETERMINISTIC as an algorithm: centroid seeding,
    cell assignment, probing and ranking are all total orders, so the
    oracle replays the identical IVF definition in SQL and the driver can
    hash-gate it like any exact query."""
    corpus, queries = _query_set(spark, sf_dir)
    return ivf_cosine_topk(corpus, queries, k=10, n_centroids=16, n_probe=4)


@query(
    "sim_knn_graph",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    cells AS (
      SELECT e.vec_id AS id, e.embedding AS v, c.c_id AS cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.c_emb')} DESC, c.c_id
             ) AS rn
      FROM embeddings e, cent c
    ),
    assigned AS (SELECT id, v, cell FROM cells WHERE rn = 1),
    ok AS (
      SELECT cell FROM assigned GROUP BY cell HAVING count(*) <= 100
    ),
    probes AS (SELECT id AS q_id, v AS q_emb, cell FROM cells WHERE rn <= 2),
    scored AS (
      SELECT p.q_id AS vec_id, a.id AS neighbor_id,
             {_cos_sql('a.v', 'p.q_emb')} AS score
      FROM assigned a
      JOIN ok USING (cell)
      JOIN probes p USING (cell)
      WHERE p.q_id != a.id
    )
    SELECT vec_id, neighbor_id, score FROM (
      SELECT vec_id, neighbor_id, score,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY score DESC, neighbor_id
             ) AS rn
      FROM scored
    ) WHERE rn <= 8
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-NN GRAPH (k=8, 16 cells, 2 probes, ``max_cell``
    hot-cell cap LIVE at 100 and replayed in the oracle) — the r12
    verdict's named gap: ``sim_knn_label_accuracy`` documented "IVF
    kNN-graph" as its 100 TB swap but no operator built one.
    ``operators/similarity.knn_graph`` gives EVERY corpus vector its
    approximate k nearest neighbors via an IVF-blocked candidate join —
    centroids collected once (bounded) and inlined so home-cell
    assignment and probe selection are pure projections, one
    cell-keyed exchange, per-vector top-k window — the edge list that
    feeds SemDeDup-style clustering and corpus-scale kNN diagnostics.
    Deterministic end to end (seeded centroids, total-order
    tie-breaks), so the oracle replays assignment, probing, the cell
    census, scoring, and ranking in SQL; recall vs brute force is
    pinned in pytest (the approximate-vs-exact split every IVF row
    uses)."""
    emb = table(spark, sf_dir, "embeddings")
    return knn_graph(
        emb, k=8, n_centroids=16, n_probe=2, max_cell=100
    )


@query(
    "sim_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE cent AS (
      SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    cells AS (
      SELECT e.vec_id AS id, e.embedding AS v, c.c_id AS cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.c_emb')} DESC, c.c_id
             ) AS rn
      FROM embeddings e, cent c
    ),
    assigned AS (SELECT id, v, cell FROM cells WHERE rn = 1),
    ok AS (
      SELECT cell FROM assigned GROUP BY cell HAVING count(*) <= 100
    ),
    probes AS (SELECT id AS q_id, v AS q_emb, cell FROM cells WHERE rn <= 2),
    scored AS (
      SELECT p.q_id AS vec_id, a.id AS neighbor_id,
             {_cos_sql('a.v', 'p.q_emb')} AS score
      FROM assigned a
      JOIN ok USING (cell)
      JOIN probes p USING (cell)
      WHERE p.q_id != a.id
    ),
    graph AS (
      SELECT vec_id, neighbor_id, score FROM (
        SELECT vec_id, neighbor_id, score,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM scored
      ) WHERE rn <= 8
    ),
    edges AS (SELECT vec_id AS a, neighbor_id AS b FROM graph
              WHERE score >= 0.35),
    bi AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
    cc(node, label) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT bi.b, cc.label FROM cc JOIN bi ON bi.a = cc.node
    )
    SELECT node AS vec_id,
           min(label) AS cluster_id,
           (node = min(label)) AS keep
    FROM cc GROUP BY node
    """,
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup — the k-NN graph consumed by the
    composition it exists for: approximate kNN edges (16 cells, 2
    probes, cell cap 100), threshold at cosine ≥ 0.35, alternating
    min-label connected components, canonical (min-id) survivor per
    cluster → ``(vec_id, cluster_id, keep)``. The fixture embeddings
    carry NO true semantic duplicates (measured max pairwise cosine
    0.513 at sf0.01), so the threshold sits inside the ambient
    similarity mass to exercise real multi-member clusters externally
    (201 directed edges at sf0.01); planted-near-duplicate keep-list
    semantics are pinned in pytest, where the survivors of a planted
    clone family are checked exactly. Oracle = the full graph replay
    (assignment, probing, cell census, top-k) + recursive-CTE
    transitive closure — both CC engine and graph are hash-gated
    end-to-end."""
    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, tau=0.35, k=8, n_centroids=16, n_probe=2, max_cell=100
    )


# Three-member clone FAMILIES for the realistic-τ semantic-dedup row:
# every vector gets TWO planted copies (+1e6 with the first component
# +0.01, +2e6 with +0.02) — each family pairwise cosine ≈0.999 while the
# ambient corpus maxes out at ≈0.513, so τ=0.9 separates families with a
# wide margin on both sides. Deterministic double arithmetic both
# engines reproduce bit-for-bit (the sim_embedding_near_dup recipe).
_AUG3_SQL = """
    aug AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 + CASE WHEN i = 1 THEN 0.01 ELSE 0.0 END)
      FROM embeddings
      UNION ALL
      SELECT vec_id + 2000000,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 + CASE WHEN i = 1 THEN 0.02 ELSE 0.0 END)
      FROM embeddings
    )
"""


def _clone_family_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", to_double_array("embedding").alias("embedding"))

    def shifted(shift: float):
        return lambda x, i: x.cast("double") + F.when(
            i == 0, F.lit(shift)
        ).otherwise(F.lit(0.0))

    out = base
    for k, shift in ((1, 0.01), (2, 0.02)):
        out = out.unionAll(
            emb.select(
                (F.col("vec_id") + F.lit(k * 1000000)).alias("vec_id"),
                F.transform("embedding", shifted(shift)).alias("embedding"),
            )
        )
    return out


@query(
    "sim_semantic_dedup_planted",
    oracle=f"""
    WITH RECURSIVE {_AUG3_SQL},
    cent AS (
      SELECT vec_id AS c_id, v AS c_emb FROM aug
      ORDER BY vec_id LIMIT 16
    ),
    cells AS (
      SELECT e.vec_id AS id, e.v, c.c_id AS cell,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.v', 'c.c_emb')} DESC, c.c_id
             ) AS rn
      FROM aug e, cent c
    ),
    assigned AS (SELECT id, v, cell FROM cells WHERE rn = 1),
    probes AS (SELECT id AS q_id, v AS q_emb, cell FROM cells WHERE rn <= 2),
    scored AS (
      SELECT p.q_id AS vec_id, a.id AS neighbor_id,
             {_cos_sql('a.v', 'p.q_emb')} AS score
      FROM assigned a
      JOIN probes p USING (cell)
      WHERE p.q_id != a.id
    ),
    graph AS (
      SELECT vec_id, neighbor_id, score FROM (
        SELECT vec_id, neighbor_id, score,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY score DESC, neighbor_id
               ) AS rn
        FROM scored
      ) WHERE rn <= 8
    ),
    edges AS (SELECT vec_id AS a, neighbor_id AS b FROM graph
              WHERE score >= 0.9),
    bi AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
    cc(node, label) AS (
      SELECT vec_id, vec_id FROM aug
      UNION
      SELECT bi.b, cc.label FROM cc JOIN bi ON bi.a = cc.node
    )
    SELECT node AS vec_id,
           min(label) AS cluster_id,
           (node = min(label)) AS keep
    FROM cc GROUP BY node
    """,
)
def sim_semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the PRODUCTION threshold over PLANTED clone families
    (r14) — the realistic-regime twin of ``sim_semantic_dedup``, whose
    fixture carries no true semantic duplicates (τ there sits at 0.35
    inside the ambient mass by design): every corpus vector gets two
    deterministic perturbed copies (family pairwise cosine ≈0.999 vs
    ambient ≤0.513), the approximate kNN graph is built over the 3×
    corpus (16 seeded cells, 2 probes, k=8), edges threshold at τ=0.9,
    and connected components elect the min-id survivor — so the
    externally hash-gated keep-list GENUINELY PRUNES the planted
    clones: exactly one ``keep`` per family, always the original
    (clone ids are +1e6/+2e6). Clones share their original's home cell
    (near-identical vectors), so family edges ride the same cell-keyed
    join the kNN graph always runs — no all-pairs anywhere; the
    hot-cell cap stays off here so families are never traded away
    (``sim_semantic_dedup`` gates the capped posture). Oracle = full
    graph replay + recursive-CTE closure over the same 3× corpus."""
    return semantic_dedup(
        _clone_family_corpus(spark, sf_dir),
        tau=0.9,
        k=8,
        n_centroids=16,
        n_probe=2,
        max_cell=None,
        # r17 (the ADVICE r16 skew item): THIS query is the named hazard —
        # max_cell stays off so clone families are never traded away, which
        # previously meant an uncapped cell collapsed into ONE collect_list
        # row per side. block_rows bounds the physical block row at
        # ~4096·64·8B ≈ 2 MB regardless of cell occupancy; at this SF every
        # cell fits one sub-block (ceil(|cell|/4096) = 1) so the grouped
        # shape — and the result, which is sub-block-invariant anyway — is
        # unchanged, while a modal cell at production scale splits instead
        # of forming a multi-GB row (Spark's 2 GiB row buffer limit).
        block_rows=4096,
    )


@query(
    "sim_centroid_by_label",
    oracle="""
    WITH pos AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    ),
    ds AS (SELECT label, pos, avg(v) AS m, count(*) AS cnt
           FROM pos GROUP BY 1, 2)
    SELECT label,
           round(sqrt(sum(m * m)), 6) AS centroid_norm,
           CAST(max(cnt) AS BIGINT) AS n_vectors
    FROM ds GROUP BY label
    """,
)
def sim_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_common_spark.operators.similarity import embedding_centroids

    return embedding_centroids(table(spark, sf_dir, "embeddings"))


@query(
    "sim_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS x
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, x,
             127.0 / greatest(list_max(list_transform(x, e -> abs(e))),
                              1e-30) AS scale
      FROM v
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           array_to_string(list_transform(x, e -> CAST(round(e * scale, 0)
                                                       AS INT)), ',') AS qvec,
           TRUE AS recon_ok
    FROM s
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding table
    (operators.similarity.quantize_embeddings_int8): per-vector scale +
    quantized values (stringified — the driver cannot hash list cells) and
    a reconstruction-error invariant the quantizer must make true
    (max |x − q/scale| ≤ 0.5/scale + ulp slack). The oracle replays scale,
    rounding and the stringified code vector exactly; recon_ok is TRUE on
    the oracle side by definition. The whole query is ONE map-only scan:
    the original vector rides alongside the operator's output columns, so
    the reconstruction check needs no self-join."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.functions.vectors import to_double_array
    from kafka_streams_common_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    emb = table(spark, sf_dir, "embeddings")
    base = quantize_embeddings_int8(emb).withColumn(
        "x", to_double_array(F.col("embedding"))
    )
    err = F.array_max(
        F.zip_with(
            "x", "qvec", lambda e, qq: F.abs(e - qq.cast("double") / F.col("scale"))
        )
    )
    return base.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.concat_ws(",", F.transform("qvec", lambda e: e.cast("string"))).alias(
            "qvec"
        ),
        (err <= F.lit(0.5) / F.col("scale") + F.lit(1e-9)).alias("recon_ok"),
    )


@query(
    "sim_ivf_int8_rerank",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS x
      FROM embeddings
    ),
    r AS (
      SELECT vec_id, x,
             list_transform(x, e -> CAST(round(e * scale, 0) AS INT) / scale) AS rv
      FROM (SELECT vec_id, x,
                   127.0 / greatest(list_max(list_transform(x, e -> abs(e))),
                                    1e-30) AS scale
            FROM v)
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0
    ),
    cent AS (
      SELECT vec_id AS c_id, rv AS c_emb FROM r ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT vec_id, rv, cell FROM (
        SELECT r.vec_id, r.rv, c.c_id AS cell,
               row_number() OVER (
                 PARTITION BY r.vec_id
                 ORDER BY {_cos_sql('r.rv', 'c.c_emb')} DESC, c.c_id
               ) AS rn
        FROM r, cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT q_id, q_emb, cell FROM (
        SELECT q.q_id, q.q_emb, c.c_id AS cell,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY {_cos_sql('q.q_emb', 'c.c_emb')} DESC, c.c_id
               ) AS rn
        FROM q, cent c
      ) WHERE rn <= 4
    ),
    short AS (
      SELECT q_id, q_emb, vec_id FROM (
        SELECT p.q_id, p.q_emb, a.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_id
                 ORDER BY {_cos_sql('a.rv', 'p.q_emb')} DESC, a.vec_id
               ) AS rn
        FROM assigned a JOIN probes p ON a.cell = p.cell
        WHERE p.q_id != a.vec_id
      ) WHERE rn <= 30
    )
    SELECT q_id, vec_id, score FROM (
      SELECT sh.q_id, sh.vec_id, {_cos_sql('v.x', 'sh.q_emb')} AS score,
             row_number() OVER (
               PARTITION BY sh.q_id
               ORDER BY {_cos_sql('v.x', 'sh.q_emb')} DESC, sh.vec_id
             ) AS rn
      FROM short sh JOIN v ON v.vec_id = sh.vec_id
    ) WHERE rn <= 10
    """,
)
def sim_ivf_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-aware ANN: IVF candidate search scored on reconstructed
    int8 codes (8× smaller index scan), exact full-precision re-rank of
    the per-query shortlist (operators.similarity.ivf_int8_rerank_topk).
    Deterministic end-to-end — quantization, seeding, and every ranking
    are total orders — so the oracle replays the identical definition
    and the driver hash-gates it like an exact query."""
    from kafka_streams_common_spark.operators.similarity import ivf_int8_rerank_topk

    corpus, queries = _query_set(spark, sf_dir)
    return ivf_int8_rerank_topk(
        corpus, queries, k=10, n_centroids=16, n_probe=4, shortlist=30
    )


@query(
    "sim_semantic_dedup_apply",
    oracle=f"""
    WITH RECURSIVE {_AUG_SQL.strip().rstrip()},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      WHERE {_cos_sql('a.v', 'b.v')} >= 0.95
    ),
    bi AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    cc(node, label) AS (
      SELECT vec_id, vec_id FROM aug
      UNION
      SELECT bi.b, cc.label FROM cc JOIN bi ON bi.a = cc.node
    ),
    canon AS (SELECT node AS vec_id, min(label) AS cluster_id
              FROM cc GROUP BY node)
    SELECT g.vec_id
    FROM aug g JOIN canon c ON g.vec_id = c.vec_id AND g.vec_id = c.cluster_id
    """,
)
def sim_semantic_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup APPLY over embeddings: the query an
    embedding-store pipeline actually ships — cosine near-dup pairs
    (hyperplane-LSH banded + exact verify, never all-pairs) collapse into
    clusters via label propagation, and only each cluster's canonical
    (min-id) vector survives. Runs on the planted-near-dup augmented
    corpus (every original + its perturbed copy sit at cosine ≈ 0.999,
    so each pair collapses to the original). Clustering shuffles carry
    only ids and hashes; the oracle replays the brute-force pair
    definition + a recursive-CTE transitive closure."""
    from pyspark.sql import functions as F

    from kafka_streams_common_spark.operators.cluster import connected_components

    corpus = _augmented_corpus(spark, sf_dir)
    pairs = hyperplane_lsh_near_dup_pairs(corpus, tau=0.95, dim=64).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    cc = connected_components(
        corpus.select(F.col("vec_id").alias("doc_id")), pairs
    )
    canonical = cc.filter(F.col("doc_id") == F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    return corpus.join(canonical, "vec_id", "left_semi").select("vec_id")


@query(
    "sim_centroid_outliers",
    oracle=f"""
    WITH pos AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos,
             CAST(sum(CAST(round(v, 6) AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS m
      FROM pos GROUP BY label, pos
    ),
    cvec AS (SELECT label, list(m ORDER BY pos) AS c FROM cent GROUP BY label)
    SELECT e.vec_id, e.label,
           {_cos_sql('e.embedding', 'c.c')} AS centroid_cosine,
           {_cos_sql('e.embedding', 'c.c')} < 0.0 AS is_outlier
    FROM embeddings e JOIN cvec c USING (label)
    """,
)
def sim_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier gate
    (operators.similarity.centroid_cosine_outliers): flag vectors whose
    cosine to their label centroid is negative — mislabels/noise pruning,
    the loner-complement of SemDeDup. Centroid dims are exact order-free
    DECIMAL(28,12) sums (bit-identical at any parallelism and on both
    engines), so the raw cosine doubles hash-match with NO output
    rounding — the determinism technique the plain double-avg centroid
    query (sim_centroid_by_label) cannot offer."""
    from kafka_streams_common_spark.operators.similarity import (
        centroid_cosine_outliers,
    )

    return centroid_cosine_outliers(table(spark, sf_dir, "embeddings"), tau=0.0)


@query(
    "sim_diverse_cell_sample",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.c_id AS cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.c_emb')} DESC, c.c_id
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    )
    SELECT vec_id, cell FROM (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY cell
               ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                          ::BIGINT, vec_id
             ) AS rn
      FROM assigned
    ) WHERE rn <= 8
    """,
)
def sim_diverse_cell_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware representative sampling
    (operators.similarity.cell_diverse_sample): at most 8 vectors per IVF
    cell, ranked by md5(id) within the cell — coverage of every occupied
    region of embedding space where a plain hash sample would reproduce
    corpus skew (the distributable stand-in for greedy MMR/k-center
    selection). Deterministic end to end: lowest-id centroid seeding,
    max_by cell argmax, md5 within-cell rank — the oracle replays the
    identical definition."""
    from kafka_streams_common_spark.operators.similarity import cell_diverse_sample

    return cell_diverse_sample(
        table(spark, sf_dir, "embeddings"), n_per_cell=8, n_centroids=16
    )


@query(
    "sim_ivf_pq_rerank",
    oracle="""
    SELECT vec_id AS q_id,
           CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def sim_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with full-precision re-rank
    (operators.similarity.ivf_pq_topk) — the FAISS-taxonomy IVF-PQ shape
    done relationally: seeded-k-means codebooks (trained driver-side on
    the constant-size md5 sample), Arrow-kernel PQ encoding (map-only,
    8× narrower rows than the float corpus), cell-pruned ADC scoring
    through a broadcast (query, subspace, code) lookup table with
    DECIMAL-exact partial sums, then exact cosine re-rank of the
    shortlist.

    Codebook training is not SQL-expressible, so — the sketch-row
    convention (HLL, approx-quantiles) — the hash-gated row carries
    deterministic invariants instead of replayed values: every query
    returns exactly k results, and per-query recall@10 against the
    in-engine brute-force baseline clears a floor of 3/10 (the fixture's
    near-uniform embeddings are PQ's worst case; the ≥0.9 recall story
    on clustered data is pinned in pytest). Everything is seeded, so
    the booleans cannot flap at a given corpus.

    Index parameters SCALE WITH THE CORPUS (r15): the sf0.1 oracle
    sweep caught the original fixed (16 cells, probe 8, rerank 60)
    shape dropping to 1/10 minimum recall on the 2,000-vector sf0.1
    fixture — cell count and shortlist must grow with n or candidate
    quality decays. The FAISS-taxonomy rule applied here: cells ≈ √n
    (power of two, floor 16), probe = cells/2, shortlist =
    max(60, n/8) capped at 1,000. At the 500-vector gate SFs this
    keeps the original 16-cell/probe-8 shape (measured minimum 5/10
    recall); at sf0.1 it yields 32/16/250 and restores the same 5/10
    minimum (from 1/10). At warehouse scale the same rule keeps ADC
    work per query ~√n-cells-bounded while the cap keeps the exact
    re-rank stage constant-size.
    """
    import math

    from kafka_streams_common_spark.operators.similarity import (
        brute_force_cosine_topk,
        collect_training_sample,
        ivf_pq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.count()
    if n == 0:
        raise ValueError(
            "sim_ivf_pq_rerank: embeddings corpus is empty — "
            "cannot size the IVF-PQ index from n"
        )
    n_cells = 1 << max(4, round(math.log2(math.sqrt(n))))
    # one md5-ordered sample collect feeds BOTH trainers (r16): the
    # centroid trainer reads its n_cells·32-row prefix, the PQ trainer its
    # 512-row prefix — bit-identical inputs to each training its own
    # TakeOrdered+collect (prefix property, collect_training_sample),
    # one corpus top-N job instead of two
    sample = collect_training_sample(emb, max(n_cells * 32, 512))
    cent = train_ivf_centroids(emb, n_centroids=n_cells, _sample_rows=sample)
    cbooks = train_pq_codebooks(emb, _sample_rows=sample)
    # materialize the (|queries|·k)-row result ONCE (bounded: 400 rows at
    # sf0.1): it feeds BOTH the per-query count and the recall join, and
    # without this the whole IVF-PQ DAG — encode/assign kernels included —
    # executed twice (r16, visible as duplicated ArrowEvalPython subtrees
    # in the pre-fix plan)
    res = ivf_pq_topk(
        emb,
        queries,
        k=10,
        n_probe=max(4, n_cells // 2),
        rerank=min(max(60, n // 8), 1000),
        centroids=cent,
        codebooks=cbooks,
    ).localCheckpoint(eager=True)
    exact = brute_force_cosine_topk(emb, queries, k=10).select(
        F.col("q_id").alias("__eq"), F.col("vec_id").alias("__ev")
    )
    per_q = res.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_results")
    )
    # renamed join keys on the exact side: both frames descend from the
    # same scan, and same-name column equality can silently resolve to a
    # trivially-true self-comparison (Spark warns, then cross-counts)
    hits = (
        res.join(
            exact,
            (F.col("q_id") == F.col("__eq")) & (F.col("vec_id") == F.col("__ev")),
        )
        .groupBy(F.col("q_id").alias("__hq"))
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        per_q.join(hits, per_q["q_id"] == F.col("__hq"), "left")
        .select(
            "q_id",
            "n_results",
            (F.coalesce(F.col("__hits"), F.lit(0)) >= 3).alias("recall_ok"),
        )
    )


def _jl_oracle(in_dim: int = 64, out_dim: int = 8, seed: int = 7) -> str:
    import math

    from kafka_streams_common_spark.operators.similarity import achlioptas_signs

    signs = achlioptas_signs(in_dim, out_dim, seed)
    scale = repr(1e6 * math.sqrt(float(out_dim)))
    cols = []
    for j in range(out_dim):
        terms = "".join(
            ("+" if signs[i][j] > 0 else "-") + f"ii[{i + 1}]"
            for i in range(in_dim)
        ).lstrip("+")
        cols.append(f"CAST(({terms}) AS DOUBLE) / {scale} AS p{j}")
    sel = ",\n           ".join(cols)
    return f"""
    WITH ints AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS ii
      FROM embeddings
    )
    SELECT vec_id,
           {sel}
    FROM ints
    """


@query("sim_random_projection", oracle=_jl_oracle())
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss ±1 projection of the 64-d embeddings down to
    8 dims — the map-only pre-projection that narrows ANN/LSH/cluster
    shuffles. Engine-exact by construction: the md5-seeded sign matrix is
    regenerated identically in the oracle, and the signed sums run in
    scaled-integer arithmetic (order-free) before ONE final double
    division."""
    from kafka_streams_common_spark.operators.similarity import random_project

    return random_project(
        table(spark, sf_dir, "embeddings"), in_dim=64, out_dim=8, seed=7
    )


_MMR_PICK = """
         (SELECT {expr} FROM cand c
          WHERE c.q_id = s.q_id AND NOT list_contains(s.sel_list, c.vec_id)
          ORDER BY 0.7 * c.score - 0.3 * (
            SELECT max(p.sim_ab) FROM pair p
            WHERE p.q_id = s.q_id AND p.a = c.vec_id
              AND list_contains(s.sel_list, p.b)) DESC, c.vec_id
          LIMIT 1)
"""
_MMR_SCORE_EXPR = """0.7 * c.score - 0.3 * (
            SELECT max(p.sim_ab) FROM pair p
            WHERE p.q_id = s.q_id AND p.a = c.vec_id
              AND list_contains(s.sel_list, p.b))"""


@query(
    "sim_mmr_diversified_topk",
    oracle=f"""
    WITH RECURSIVE
    q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.q_id, e.vec_id, {_cos_sql('e.embedding', 'q.q_emb')} AS score
      FROM embeddings e, q WHERE q.q_id != e.vec_id
    ),
    cand AS (
      SELECT q_id, vec_id, score FROM (
        SELECT q_id, vec_id, score,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 12
    ),
    pair AS (
      SELECT c1.q_id, c1.vec_id AS a, c2.vec_id AS b,
             {_cos_sql('e1.embedding', 'e2.embedding')} AS sim_ab
      FROM cand c1
      JOIN cand c2 ON c1.q_id = c2.q_id AND c1.vec_id != c2.vec_id
      JOIN embeddings e1 ON e1.vec_id = c1.vec_id
      JOIN embeddings e2 ON e2.vec_id = c2.vec_id
    ),
    sel AS (
      SELECT q_id, 1 AS step, vec_id AS picked,
             0.7 * score - 0.3 * 0.0 AS mmr_score,
             [vec_id] AS sel_list
      FROM (
        SELECT q_id, vec_id, score,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        FROM cand
      ) WHERE rn = 1
      UNION ALL
      SELECT s.q_id, s.step + 1,
             {_MMR_PICK.format(expr='c.vec_id')},
             {_MMR_PICK.format(expr=_MMR_SCORE_EXPR)},
             list_append(s.sel_list, {_MMR_PICK.format(expr='c.vec_id')})
      FROM sel s WHERE s.step < 5
    )
    SELECT q_id, CAST(step AS BIGINT) AS step, picked AS vec_id, mmr_score
    FROM sel
    """,
)
def sim_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (``operators/similarity.py:
    mmr_diversified_topk``): exact cosine shortlist (12) per query, then
    greedy maximal-marginal-relevance selection of 5 with λ=0.7 — the
    RAG diversification pass that keeps near-duplicate passages from
    filling the context window. The oracle replays the greedy loop as a
    DuckDB RECURSIVE CTE over the same shortlist and pair similarities
    (the sequential-fold cosine spelling both engines share); the Spark
    side runs the loop in an Arrow kernel per query group over
    JVM-computed similarities, so both sides perform the identical IEEE
    multiply/subtract/max sequence — bit-equal hashes, no tolerance."""
    from kafka_streams_common_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    corpus, queries = _query_set(spark, sf_dir)
    return mmr_diversified_topk(corpus, queries, k=5, shortlist=12)


@query(
    "sim_knn_label_accuracy",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    scored AS (
      SELECT q.q_id, q.q_label, e.label,
             {_cos_sql('e.embedding', 'q.q_emb')} AS score, e.vec_id
      FROM embeddings e, q WHERE q.q_id != e.vec_id
    ),
    knn AS (
      SELECT q_id, q_label, label FROM (
        SELECT q_id, q_label, label, score, vec_id,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT q_id, q_label, label, count(*) AS v
      FROM knn GROUP BY q_id, q_label, label
    ),
    pred AS (
      SELECT q_id, q_label, label AS pred_label FROM (
        SELECT q_id, q_label, label, v,
               row_number() OVER (
                 PARTITION BY q_id ORDER BY v DESC, label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT CAST(q_label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
    FROM pred GROUP BY q_label
    """,
)
def sim_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label accuracy on an eval sample (every 10th
    vector) — the embedding-quality / label-noise diagnostic run before
    trusting a labeled corpus: each sampled vector's label is predicted
    by majority vote of its 5 cosine-nearest neighbors (self excluded),
    reported as per-label accuracy. Deterministic end-to-end: neighbor
    sets ordered by (score desc, vec_id), votes resolved by (count desc,
    label). The exact shortlist scan is the documented brute-force
    baseline over the SAMPLE (|sample|×|corpus| pairs); building the
    full kNN graph at 100 TB swaps in ivf_cosine_topk cell probing —
    same downstream vote, oracle unchanged on the sampled gate."""
    from pyspark.sql import Window as W

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    nn = brute_force_cosine_topk(emb, queries.select("q_id", "q_emb"), k=5)
    knn = nn.join(
        emb.select(F.col("vec_id").alias("n_id"), F.col("label")),
        nn.vec_id == F.col("n_id"),
    ).join(F.broadcast(queries.select("q_id", "q_label")), "q_id")
    votes = knn.groupBy("q_id", "q_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = W.partitionBy("q_id").orderBy(F.desc("v"), F.asc("label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("q_id", "q_label", F.col("label").alias("pred_label"))
    )
    correct = (F.col("pred_label") == F.col("q_label")).cast("long")
    return pred.groupBy(F.col("q_label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        (F.sum(correct).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("accuracy"),
    )
