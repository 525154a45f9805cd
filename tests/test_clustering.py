"""Incremental clustering (Delta liquid-clustering parity): a z-order
commit records its layout in versioned props; `incremental=True` (and
plain OPTIMIZE on a clustered table) rewrites only files added since the
last clustered commit, by file identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _grid(spark, n, id_base=0):
    rows = [(i // 64, i % 64, id_base + i) for i in range(n)]
    return spark.createDataFrame(rows, "x int, y int, id int")


def test_incremental_zorder_touches_only_new_files(spark, root):
    t = ParquetTable.create(spark, root, _grid(spark, 4096))
    t.optimize(zorder_by=["x", "y"], n_files=16)  # full cluster: v1
    clustered = set(t._manifest()["files"])
    t.append(_grid(spark, 200, id_base=100000))  # ~5% new rows: v2
    appended = set(t._manifest()["files"]) - clustered
    v = t.optimize(zorder_by=["x", "y"], incremental=True)
    m = t._manifest(v)
    # file identity: every originally-clustered file survives untouched
    assert clustered <= set(m["files"])
    # and exactly the appended files were replaced
    assert not (appended & set(m["files"]))
    assert t.read().count() == 4096 + 200
    # second-column pruning still holds on the layout
    pruned = t.scan("y", lo=0, hi=3)
    assert pruned.count() == 4 * 64 + sum(
        1 for i in range(200) if i % 64 <= 3
    )
    assert len(pruned.inputFiles()) <= len(m["files"]) // 2
    # re-run with nothing new: idempotent no-op
    assert t.optimize(zorder_by=["x", "y"], incremental=True) == v


def test_plain_optimize_preserves_clustered_layout(spark, root):
    """Routine compaction on a clustered table must not shred the
    layout: plain optimize() auto-routes to incremental re-clustering,
    and with nothing new it commits nothing."""
    t = ParquetTable.create(spark, root, _grid(spark, 4096))
    t.optimize(zorder_by=["x", "y"], n_files=16)
    v1 = t.latest_version()
    clustered = set(t._manifest()["files"])
    assert t.optimize() == v1, "no new files -> no-op"
    t.append(_grid(spark, 100, id_base=200000))
    v = t.optimize()  # compaction, but clustering-aware
    m = t._manifest(v)
    assert clustered <= set(m["files"]), "clustered files untouched"
    state = m["props"]["clustering"]
    assert state["cols"] == ["x", "y"]
    assert t.read().count() == 4196


def test_boundary_merge_folds_small_clustered_layers(spark, root):
    """boundary_below_mb re-merges small incremental layers: repeated
    small appends + incremental passes accumulate small clustered
    files; a boundary pass folds them while big files survive."""
    t = ParquetTable.create(spark, root, _grid(spark, 4096))
    t.optimize(zorder_by=["x"], n_files=4)
    for i in range(3):
        t.append(_grid(spark, 64, id_base=300000 + 1000 * i))
        t.optimize(zorder_by=["x"], incremental=True)
    n_before = len(t._manifest()["files"])
    assert n_before >= 7  # 4 base + one layer per append
    v = t.optimize(
        zorder_by=["x"], incremental=True, boundary_below_mb=64.0
    )
    m = t._manifest(v)
    # everything was below the (huge) boundary: one merged layout
    assert len(m["files"]) < n_before
    assert t.read().count() == 4096 + 3 * 64
    # state resets to prefixes that actually own live files
    prefixes = set(m["props"]["clustering"]["prefixes"])
    from azure_databricks_lakehouse_spark.sources.tables import (
        _commit_prefix,
    )

    assert {_commit_prefix(f) for f in m["files"]} <= prefixes


def test_full_zorder_resets_incremental_state(spark, root):
    t = ParquetTable.create(spark, root, _grid(spark, 1024))
    t.optimize(zorder_by=["x"], n_files=4)
    t.append(_grid(spark, 64, id_base=400000))
    t.optimize(zorder_by=["x"], incremental=True)
    assert len(t._manifest()["props"]["clustering"]["prefixes"]) >= 2
    t.optimize(zorder_by=["x"], n_files=4)  # deliberate full re-cluster
    m = t._manifest()
    assert len(m["props"]["clustering"]["prefixes"]) == 1
    assert t.read().count() == 1024 + 64


def test_incremental_folds_deletion_vectors_in_layout(spark, root):
    """A DV-masked clustered file is merge-on-read debt inside the
    layout: the next incremental pass materializes it away while other
    clustered files keep their identity."""
    t = ParquetTable.create(spark, root, _grid(spark, 4096))
    t.optimize(zorder_by=["x"], n_files=8)
    t.delete(F.col("id") == 17, mode="merge-on-read")
    m = t._manifest()
    (masked,) = m["dvs"].keys()
    untouched = set(m["files"]) - {masked}
    v = t.optimize(zorder_by=["x"], incremental=True)
    m2 = t._manifest(v)
    assert untouched <= set(m2["files"])
    assert masked not in set(m2["files"])
    assert not m2["dvs"]
    assert t.read().count() == 4095


def test_clustering_state_follows_rename_and_clears_on_drop(spark, root):
    """Rename of a clustering column keeps incremental maintenance
    matching (the physical layout didn't move); dropping one clears the
    state so auto-routed OPTIMIZE can't z-order a ghost column."""
    t = ParquetTable.create(spark, root, _grid(spark, 1024))
    t.optimize(zorder_by=["x"], n_files=4)
    clustered = set(t._manifest()["files"])
    t.rename_column("x", "bucket")
    assert t._manifest()["props"]["clustering"]["cols"] == ["bucket"]
    t.append(
        spark.createDataFrame(
            [(1, 1, 500000)], "bucket int, y int, id int"
        )
    )
    t.optimize(zorder_by=["bucket"], incremental=True)
    assert clustered <= set(t._manifest()["files"]), (
        "rename must not force a full re-cluster"
    )
    # dropping the clustering key clears the state; plain optimize
    # falls back to ordinary compaction without error
    t.drop_column("y")  # non-clustering drop keeps state
    assert "clustering" in t._manifest()["props"]
    t.drop_column("bucket")
    assert "clustering" not in t._manifest()["props"]
    t.optimize()  # no ghost-column z-order


def test_create_cluster_by_is_liquid_from_birth(spark, root):
    """CREATE TABLE ... CLUSTER BY: v0 lands z-ordered with recorded
    state, and routine plain optimize() maintains the layout
    incrementally — the full liquid-clustering lifecycle without the
    caller ever passing zorder_by."""
    t = ParquetTable.create(
        spark, root, _grid(spark, 4096).repartition(16), cluster_by=["x", "y"]
    )
    m0 = t._manifest(0)
    assert m0["props"]["clustering"]["cols"] == ["x", "y"]
    total = len(m0["files"])
    assert total >= 8
    pruned = t.scan("y", lo=0, hi=3)
    assert len(pruned.inputFiles()) <= total // 2, "born clustered"
    clustered = set(m0["files"])
    t.append(_grid(spark, 100, id_base=600000))
    t.optimize()  # plain maintenance, no zorder_by argument
    m = t._manifest()
    assert clustered <= set(m["files"])
    assert t.read().count() == 4196
    assert t.scan("y", lo=0, hi=3).count() == 4 * 64 + sum(
        1 for i in range(100) if i % 64 <= 3
    )


def test_scoped_full_zorder_keeps_out_of_scope_state(spark, tmp_path):
    """optimize(zorder_by=, where=) re-clusters its scope but must NOT
    forget the out-of-scope files' clustered status — the next plain
    optimize() would otherwise rewrite the rest of the table."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("p1" if i % 2 else "p2", i // 64, i % 64, i) for i in range(4096)],
        "part string, x int, y int, id int",
    )
    t = ParquetTable.create(spark, root, df, partition_by=["part"])
    t.optimize(zorder_by=["x"], n_files=8)
    out_of_scope = {
        f for f in t._manifest()["files"] if "part=p2" in f
    }
    t.optimize(zorder_by=["x"], where="part = 'p1'")
    v = t.latest_version()
    assert out_of_scope <= set(t._manifest()["files"])
    # routine maintenance now finds nothing unclustered: no-op
    assert t.optimize() == v, "plain optimize must not rewrite p2"


def test_explicit_nfiles_rewrite_clears_clustering_state(spark, root):
    t = ParquetTable.create(spark, root, _grid(spark, 1024))
    t.optimize(zorder_by=["x"], n_files=4)
    assert "clustering" in t._manifest()["props"]
    t.optimize(n_files=2)  # deliberate un-clustered layout
    assert "clustering" not in t._manifest()["props"]
