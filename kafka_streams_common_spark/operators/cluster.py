"""Connected components over a pair graph — the dedup collapse step.

After fuzzy dedup emits near-duplicate PAIRS, a training pipeline needs
GROUPS: transitively connected docs collapse to one canonical representative.
That is connected components with min-id labels.

Implementation: iterative label propagation — every node starts labeled with
its own id; each round every node takes the min label in its neighborhood;
stop when no label changes. Each round is two distributed hash joins + an
aggregate (no driver-side graph), and the round count is bounded by the
graph diameter — small for dedup graphs, whose components are near-cliques.
The driver-side loop only checks a convergence count per round, which is the
legitimate pattern for iterative algorithms (c.f. GraphX/Pregel supersteps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    edge_cols: tuple[str, str] = ("doc_a", "doc_b"),
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one column ``node_col`` (all ids, including singletons).
    ``edges``: undirected pairs in columns ``edge_cols``.
    Returns ``(node_col, cluster_id)``.
    """
    a, b = edge_cols
    bi = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        # materialize ONCE: the edge set is consumed every round (join +
        # convergence count), and it is typically the output of an
        # expensive near-dup pipeline — without this the whole upstream
        # candidate/verify plan re-executes per iteration
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("label"))

    for _ in range(max_iterations):
        neighbor_min = (
            bi.join(labels, bi.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # checkpoint the ROUND RESULT (one blocking job running the round's
        # joins exactly once); the convergence count and the next round both
        # read the materialized rows — checkpointing `labels` instead would
        # re-execute the round's joins for the count AND for the next
        # round's checkpoint
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break

    return labels.select(F.col("node").alias(node_col), F.col("label").alias("cluster_id"))
