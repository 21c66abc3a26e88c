"""Similarity-search queries over ``embeddings`` with DuckDB oracles.

Oracle cosine is spelled as an explicit sequential double fold
(``list_sum(list_transform(...))``) which reproduces Spark's
``F.aggregate``-fold bit-for-bit; DuckDB's native ``list_cosine_similarity``
accumulates differently and does NOT hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.similarity import (
    brute_force_cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
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


@query(
    "sim_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.45
    """,
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Production threshold is ~0.9;
    the fixture embeddings top out at cosine 0.51, so the query uses τ=0.45
    to exercise a non-empty result through the correctness gate."""
    return embedding_near_dup_pairs(table(spark, sf_dir, "embeddings"), tau=0.45)


@query("sim_ivf_topk")  # approximate → rows-only driver check; recall tested in pytest
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-10 (16 cells, 4 probes) — the scale path."""
    corpus, queries = _query_set(spark, sf_dir)
    return ivf_cosine_topk(corpus, queries, k=10, n_centroids=16, n_probe=4)
