"""Planted-skew evidence: the hot-key defenses on the dedup /
fingerprint / connected-components paths must ENGAGE (visible in the
plan) and keep runtime bounded when one key dominates the input —
round-4 verdict item 5.

Each fixture plants the classic pathology (one fingerprint in 30% of
documents; one dedup key holding half the rows; one component holding
half the graph) and asserts both the mechanism and the result."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.components import (
    connected_components_star,
)
from azure_databricks_lakehouse_spark.operators.dedup import (
    keep_latest,
    keep_latest_salted,
)
from azure_databricks_lakehouse_spark.operators.fingerprints import (
    fingerprint_overlap_pairs,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hot_fingerprint_is_culled_before_the_pair_join(spark):
    """One fp in 30% of docs would contribute O((0.3 n)^2) candidate
    pairs; the doc-freq cull must kill it BEFORE the self-join, as a
    broadcast anti-join (map-side — the corpus is never shuffled by the
    hot key to count it out)."""
    n = 2000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # every doc carries 3 private fps; 30% also share fp 777
    private = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.col("doc_id") * 10 + i for i in range(3)])
        ).alias("fp"),
    )
    hot = docs.filter(F.col("doc_id") % 10 < 3).select(
        "doc_id", F.lit(777).cast("long").alias("fp")
    )
    flat = private.select("doc_id", F.col("fp").cast("long")).unionAll(hot)

    pairs = fingerprint_overlap_pairs(flat, min_shared=1, max_doc_freq=8)
    plan = _plan(pairs)
    # the cull is a broadcast LEFT ANTI join (hot-fp list broadcast)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    t0 = time.time()
    assert pairs.count() == 0  # private fps share nothing once 777 dies
    elapsed = time.time() - t0
    # without the cull the hot bucket alone is (600 choose 2) = 179700
    # pairs; with it the join input is empty — seconds, not minutes
    assert elapsed < 60
    uncullled = fingerprint_overlap_pairs(flat, min_shared=1)
    assert uncullled.count() == 179_700  # the bomb the cull defuses


def test_salted_dedup_engages_on_hot_key(spark):
    """Half the rows share one key: keep_latest_salted must fan the hot
    key across salt partitions (salt column visible in the first window)
    and still agree exactly with the unsalted window."""
    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        F.col("id").alias("ts"),
        (F.col("id") % 97).alias("payload"),
    )
    salted = keep_latest_salted(df, ["k"], ["ts"], salt_mod=16)
    plan = _plan(salted)
    # two-phase shape: the pre-aggregation window partitions by the salt
    assert "_dedup_salt" in plan
    assert plan.count("Window") >= 2
    want = {
        (r["k"], r["ts"], r["payload"])
        for r in keep_latest(df, ["k"], [F.col("ts").desc()]).collect()
    }
    got = {(r["k"], r["ts"], r["payload"]) for r in salted.collect()}
    assert got == want
    hot = [r for r in got if r[0] == "HOT"]
    assert hot == [("HOT", n - 2, (n - 2) % 97)]


def test_giant_component_converges_in_log_rounds(spark):
    """A star component holding half the nodes (max-degree hub — the
    worst skew for per-round neighbor joins) must close in O(log n)
    large-star/small-star rounds with AQE free to split the hot hub's
    join partitions (adaptive plan enabled on the round frames)."""
    n = 4000
    half = n // 2
    hub_edges = spark.range(1, half).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    # the other half: disjoint 2-cliques (pairs)
    pair_edges = spark.range(half, n, 2).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = hub_edges.unionAll(pair_edges)
    t0 = time.time()
    labels = connected_components_star(edges, max_iter=16)
    rows = labels.collect()
    elapsed = time.time() - t0
    assert elapsed < 120
    by_node = {r["node"]: r["component_id"] for r in rows}
    giant = {v for k, v in by_node.items() if k < half}
    assert giant == {0}  # one label for the half-graph component
    # each pair keeps its own two-node component, untouched by the hub
    assert by_node[half] == by_node[half + 1] == half
    n_components = len(set(by_node.values()))
    assert n_components == 1 + (n - half) // 2
