"""Connected-components operator tests: transitive closure, canonical
min-label, cluster sizes, convergence on chains longer than one hop."""

from __future__ import annotations

from azure_databricks_lakehouse_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_transitive_chain_collapses(spark):
    # 1-2, 2-3, 3-4 is one component even though (1,4) was never a pair;
    # 10-11 is a separate component.
    comp = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    got = {r["node"]: r["component_id"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_rollup(spark):
    pairs = spark.createDataFrame(
        [(5, 7), (7, 9), (20, 21)], "doc_a bigint, doc_b bigint"
    )
    rows = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert rows == {5: (5, 3), 7: (5, 3), 9: (5, 3), 20: (20, 2), 21: (20, 2)}


def test_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds
    comp = connected_components(_edges(spark, [(i, i + 1) for i in range(12)]))
    labels = {r["component_id"] for r in comp.collect()}
    assert labels == {0}
    assert comp.count() == 13
