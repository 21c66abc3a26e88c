#!/usr/bin/env python3
"""IVF probe-fraction vs recall curve — empirical sizing evidence.

The SCALE.md claim "clustered corpora reach high recall at a small probe
fraction" should be a measured curve, not an assertion. This script plants
a clustered corpus (the regime real embedding corpora live in) at 8× the
pytest fixture size, trains centroids once (seeded k-means++ on a
constant-size sample, exactly the production path), then sweeps ``n_probe``
and reports recall@10 against the brute-force baseline plus wall time —
one JSON line per operating point.

Usage: python scripts/ivf_recall_curve.py
"""

from __future__ import annotations

import json
import time

import numpy as np
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.similarity import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
    train_ivf_centroids,
)
from kafka_streams_common_spark.session import get_spark

N_VECTORS = 16_000  # 8× the pytest planted-cluster fixture
N_CLUSTERS = 20
DIM = 32
N_CENTROIDS = 32
K = 10


def main() -> None:
    spark = get_spark("ivf-recall-curve")
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in centers[i % N_CLUSTERS] + 0.15 * rng.normal(size=DIM)])
        for i in range(N_VECTORS)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    emb = emb.repartition(32).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    t0 = time.monotonic()
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_cosine_topk(emb, queries, k=K).collect()
    }
    brute_sec = round(time.monotonic() - t0, 3)
    print(json.dumps({"op": "brute_force", "sec": brute_sec, "pairs": len(exact)}))

    cent = train_ivf_centroids(emb, n_centroids=N_CENTROIDS)
    for n_probe in (1, 2, 4, 8, 16, 32):
        t0 = time.monotonic()
        approx = {
            (r["q_id"], r["vec_id"])
            for r in ivf_cosine_topk(
                emb, queries, k=K, n_probe=n_probe, centroids=cent
            ).collect()
        }
        sec = round(time.monotonic() - t0, 3)
        print(
            json.dumps(
                {
                    "op": "ivf_trained",
                    "n_centroids": N_CENTROIDS,
                    "n_probe": n_probe,
                    "probe_fraction": round(n_probe / N_CENTROIDS, 4),
                    "recall_at_10": round(len(exact & approx) / len(exact), 4),
                    "sec": sec,
                }
            )
        )


if __name__ == "__main__":
    main()
