"""Connected components over a pair graph — the step after near-dup
detection in a training-data pipeline: pair lists say "a≈b", but
dedup needs CLUSTERS (keep one representative per component, drop the
rest), and pairs compose transitively (a≈b, b≈c ⇒ {a,b,c} is one
cluster even when a≉c directly).

Implementation: iterative min-label propagation (the Pregel/GraphX
pattern expressed in DataFrames): every node starts labeled with
itself; each round a node takes the min label among itself and its
neighbors; converged when no label changes. Rounds needed = graph
diameter (≤ O(log n) with doubling variants; near-dup graphs are
shallow — duplicates cluster tightly, so 2-4 rounds in practice).

Scale shape: each round is one equi-join on node id + one min-agg —
shuffle on the node key, no driver data. The driver coordinates only
the loop and reads ONE scalar (changed-label count) per round — the
standard iterative-algorithm contract (same as GraphFrames/MLlib), not
a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `pairs`, where component is
    the minimum node id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    # init = round 1 fused: each node starts at min(self, direct
    # neighbors) — near-dup graphs are dominated by 2-node clusters,
    # which are already converged after this, so the loop usually runs
    # exactly one confirmation round
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.min(F.least("a", "b")).alias("component"))
        .cache()
    )
    for _ in range(max_iter):
        # neighbor labels: for each edge a->b, b's current label offered to a
        offered = edges.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "component")
        new_labels = (
            labels.union(offered)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "component")
