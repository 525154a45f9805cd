"""Connected components over a pair/edge list — dedup-cluster resolution.

Near-duplicate detection (MinHash q28, embedding-LSH q46, winnowing
containment q51) emits PAIRS; a training-data pipeline needs CLUSTERS —
"keep one canonical doc per component" is a connected-components problem
(A~B and B~C must collapse to one cluster even though A~C was never
emitted as a pair).

Algorithm: iterative minimum-label propagation.  Every node starts
labeled with itself; each round, a node adopts the smallest label among
itself and its neighbors; converged when no label changes.  Each round is
one shuffle (join on the edge endpoint + min-aggregate) — the classic
Pregel-style iteration expressed with DataFrames.  Rounds needed =
graph diameter; dedup-cluster graphs are near-cliques (diameter 2-3), so
3-4 rounds close them.  The driver-side loop per round does one scalar
``count`` action (convergence check) — no row data ever reaches the
driver.

At 100 TB scale the same loop holds: each iteration shuffles on node id;
for adversarially long chains switch to the large-star/small-star
variant (same join shape, provably O(log n) rounds).  ``max_iter``
bounds the loop either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """``(node, component_id)`` for every node appearing in ``edges``;
    ``component_id`` is the smallest node id in the component (a stable,
    deterministic canonical id).  Edges are treated as undirected."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # Materialize once: every iteration's convergence check is a
        # SEPARATE job, and exchange reuse does not span jobs — without
        # this the (possibly expensive) edge derivation re-runs per round.
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        # neighbor labels: for each node, the labels its neighbors carry
        neighbor = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.select("node", "label")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # convergence: did any label shrink this round?  (scalar action)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # localCheckpoint truncates the lineage so plan depth doesn't grow
        # linearly with iterations (the classic iterative-algorithm trap).
        labels = new_labels.localCheckpoint(eager=False)
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component_id"))


def dedup_clusters(
    pairs: DataFrame,
    *,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Cluster roll-up of a near-dup pair list: one row per member,
    ``(doc_id, canonical_id, cluster_size)`` with ``canonical_id`` =
    min member (the keep-this-one policy exact dedup q27 already uses)."""
    comp = connected_components(pairs, src=left, dst=right)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component_id")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component_id").alias("canonical_id"),
            "cluster_size",
        )
    )
