"""Similarity search over an ``array<float>`` embedding column.

- :func:`brute_force_cosine_topk` — exact top-k: the query set is broadcast
  (it is small by construction), the corpus streams once, and per-query
  ranking is a window over (query, score). Correct at any corpus size but
  O(|corpus|·|queries|) — the baseline and the oracle.
- :func:`ivf_cosine_topk` — IVF-style approximate search: corpus vectors are
  assigned to their nearest of C centroids (one broadcast join), queries
  probe the ``n_probe`` nearest cells, and scoring happens only inside
  probed cells — the 100 TB path (cuts scored pairs by ~C/n_probe).
- :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs above a
  threshold; exact form for oracle-checkable semantics.

All vector math is built-in higher-order functions (functions.vectors) —
JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_common_spark.functions.vectors import cosine_similarity, dot_product, l2_norm


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k per query: ``(q_id, vec_id, score)``.

    Deterministic ranking: (score desc, vec_id asc) is a total order, so
    results are stable under any parallelism. Self-matches are excluded.

    Plan note: this intentionally compiles to a BroadcastNestedLoopJoin —
    the corpus streams through ONCE scoring each row against the broadcast
    query set; for exact scoring against a small query set that is the
    optimal shape, not an accident (plan audited).
    """
    # precompute per-vector norms once (linear pass) instead of per pair;
    # the per-pair score dot/(na*nb) stays bit-identical to the inline form
    corpus_n = corpus.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("__cn")
    )
    queries_n = queries.select(
        query_id_col, query_vec_col, l2_norm(F.col(query_vec_col)).alias("__qn")
    )
    scored = (
        corpus_n.crossJoin(F.broadcast(queries_n))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                dot_product(F.col(vec_col), F.col(query_vec_col))
                / (F.col("__cn") * F.col("__qn"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k: ``(q_id, vec_id, score)``.

    Centroids are the ``n_centroids`` lowest-id corpus vectors — a
    deterministic seeding (production would plug k-means here; the index
    structure, not the centroid quality, is what this operator contributes).
    Corpus→cell assignment is one broadcast join; each query probes its
    ``n_probe`` nearest cells, so only ~n_probe/n_centroids of the corpus is
    scored per query. Approximate: recall < 1 when a true neighbor lives in
    an unprobed cell (tested against the brute-force baseline).
    """
    w_id = Window.orderBy(F.asc(id_col))
    centroids = (
        corpus.withColumn("__rn", F.row_number().over(w_id))
        .filter(F.col("__rn") <= n_centroids)
        .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"))
    )

    # corpus → nearest centroid (broadcast the tiny centroid set)
    assign_w = Window.partitionBy(id_col).orderBy(F.desc("c_score"), F.asc("c_id"))
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            id_col,
            vec_col,
            "c_id",
            cosine_similarity(F.col(vec_col), F.col("c_emb")).alias("c_score"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, F.col("c_id").alias("cell"))
    )

    # query → n_probe nearest cells
    probe_w = Window.partitionBy(query_id_col).orderBy(F.desc("c_score"), F.asc("c_id"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            query_id_col,
            query_vec_col,
            "c_id",
            cosine_similarity(F.col(query_vec_col), F.col("c_emb")).alias("c_score"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= n_probe)
        .select(query_id_col, query_vec_col, F.col("c_id").alias("cell"))
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            cosine_similarity(F.col(vec_col), F.col(query_vec_col)).alias("score"),
        )
    )
    rank_w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "score")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs ``(id_a, id_b, score)``, a < b, score ≥ tau.

    Norms are precomputed once per vector (cheap linear pass), then pairs are
    scored with a single dot product. This exact form exists as the oracle-
    checkable semantic definition; at corpus scale, generate candidates with
    :func:`ivf_cosine_topk`-style cell bucketing or random-hyperplane LSH
    first and verify with this scoring.
    """
    vecs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    score = dot_product(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= tau)
    )
