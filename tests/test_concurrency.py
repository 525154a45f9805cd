"""Logical conflict detection for concurrent DML (Delta's conflict
matrix): disjoint concurrent operations rebase and BOTH land; operations
touching the same files raise a typed ConcurrentModificationError
instead of a raw version-collision error.

The interleaving is simulated deterministically: writer B plans against
a pinned stale snapshot (its first `_manifest()` call is patched to
return the pre-commit base), so the commit collision and conflict walk
are exercised on every run — no thread-timing lottery.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import (
    ConcurrentModificationError,
    ParquetTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _table(spark, root):
    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b", i * 10) for i in range(100)],
        "k int, part string, v int",
    )
    return ParquetTable.create(spark, root, df, partition_by=["part"])


def _stale_writer(spark, root):
    """A second handle whose FIRST latest-manifest read returns the
    CURRENT snapshot even after other writers commit."""
    t2 = ParquetTable.for_path(spark, root)
    base = t2._manifest()
    orig = t2._manifest
    state = {"first": True}

    def patched(version=None):
        if version is None and state["first"]:
            state["first"] = False
            return base
        return orig(version)

    t2._manifest = patched
    return t2


def test_disjoint_partition_deletes_both_land(spark, root):
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.delete("part = 'a' AND k < 10")  # writer A commits v1
    v = b.delete("part = 'b' AND k >= 90")  # planned on v0 -> rebases
    assert v == 2, "loser must rebase onto the winner and commit"
    got = t.read()
    assert got.count() == 80
    assert got.filter("k < 10").count() == 0
    assert got.filter("k >= 90").count() == 0
    ops = [c.operation for c in t.history()]
    assert ops[-2:] == ["DELETE", "DELETE"]


def test_overlapping_delete_update_raises_typed_error(spark, root):
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.delete("part = 'a' AND k = 1")  # rewrites a file in part=a
    with pytest.raises(ConcurrentModificationError, match="modified files"):
        b.update("part = 'a' AND k = 2", {"v": F.lit(-1)})
    # the winner's state is intact, the loser changed nothing
    assert t.latest_version() == 1
    assert t.read().count() == 99


def test_concurrent_dv_deletes_same_file_conflict(spark, root):
    """Two merge-on-read deletes masking the SAME file: the loser's CDC
    and probe counts were computed under a stale mask — conflict, not a
    silent DV merge (Delta's ConcurrentDeleteDeleteException)."""
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.delete("part = 'a' AND k = 1", mode="merge-on-read")
    with pytest.raises(ConcurrentModificationError, match="modified files"):
        b.delete("part = 'a' AND k = 2", mode="merge-on-read")


def test_concurrent_append_never_conflicts_with_delete(spark, root):
    """Write-serializable isolation: an append's rows were invisible to
    the delete's snapshot; the delete rebases and both commits hold."""
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.append(
        spark.createDataFrame([(1000, "a", 1)], "k int, part string, v int")
    )
    v = b.delete("part = 'a' AND k < 10")
    assert v == 2
    got = t.read()
    assert got.filter("k = 1000").count() == 1, "appended row survives"
    assert got.filter("k < 10").count() == 0
    assert got.count() == 91


def test_concurrent_schema_change_conflicts(spark, root):
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.rename_column("v", "value")
    with pytest.raises(ConcurrentModificationError, match="schema"):
        b.delete("part = 'b' AND k = 60")


def test_merge_collision_raises_typed_error(spark, root):
    """Snapshot-wide operations don't rebase — but the collision error
    is the typed one, so callers catch ONE exception type."""
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.append(
        spark.createDataFrame([(2000, "b", 2)], "k int, part string, v int")
    )
    src = spark.createDataFrame([(1, "a", -1)], "k int, part string, v int")
    with pytest.raises(ConcurrentModificationError, match="MERGE collided"):
        b.merge(src, on=["k", "part"])


def test_concurrent_bloom_reconfig_conflicts_with_dml(spark, root):
    """A DML's new-file bitmaps are built under its snapshot's bloom
    config; rebasing onto a reconfigured index would stamp them with
    the wrong cfg hash and scan_eq would prune real matches — so it's
    a conflict, not a rebase."""
    t = _table(spark, root)
    t.set_bloom_index(["k"], m_bits=2048)
    b = _stale_writer(spark, root)
    t.set_bloom_index(["k"], m_bits=4096)
    with pytest.raises(ConcurrentModificationError, match="index config"):
        b.delete("part = 'b' AND k = 60")


def test_concurrent_analyze_never_conflicts_and_stats_survive_rebase(
    spark, root
):
    """ANALYZE is a metadata-only commit outside the conflict matrix's
    guarded keys: a DML that raced it must rebase cleanly AND carry the
    new `statistics` property forward (props thread from the REBASED
    manifest, not the DML's base snapshot)."""
    _table(spark, root)
    stale = _stale_writer(spark, root)  # computes against v0
    fresh = ParquetTable.for_path(spark, root)
    fresh.analyze(noscan=True)  # v1: statistics land
    stale.delete("part = 'a'")  # collides on v1, rebases, lands v2
    final = ParquetTable.for_path(spark, root)
    s = final.statistics()
    assert s is not None and s["num_rows"] == 100  # pre-delete snapshot
    assert final.read().count() == 50
    ops = [c.operation for c in final.history()]
    assert ops == ["CREATE", "ANALYZE", "DELETE"]


def test_concurrent_append_only_enable_conflicts_with_dml(spark, root):
    """A DML planned while delta.appendOnly was unset must NOT land
    after a concurrent commit enables it: the gate validated the BASE
    snapshot's flag, so the rebase walk treats the flip as a
    validated-prop change (round-10 conflict-matrix entry — without it
    a row-removing DML would slip onto a now-append-only table)."""
    t = _table(spark, root)
    b = _stale_writer(spark, root)
    t.set_properties({"delta.appendOnly": "true"})
    with pytest.raises(ConcurrentModificationError, match="constraints|config"):
        b.delete("part = 'b' AND k = 60")


def test_concurrent_appends_allocate_disjoint_row_ids(spark, root):
    """Row-id allocation is metadata-only, so an append that loses the
    commit race re-allocates its files' base ids from the WINNER's high
    water during the rebase — no id collision, no file rewrite."""
    t = _table(spark, root)
    t.set_properties({"delta.enableRowTracking": "true"})
    b = _stale_writer(spark, root)
    t.append(
        spark.createDataFrame(
            [(1000 + i, "a", 1) for i in range(10)], "k int, part string, v int"
        )
    )
    b.append(
        spark.createDataFrame(
            [(2000 + i, "b", 2) for i in range(5)], "k int, part string, v int"
        )
    )
    rows = t.read(with_row_ids=True).collect()
    ids = [r._row_id for r in rows]
    assert len(rows) == 115
    assert len(set(ids)) == 115, "concurrent appends must not share row ids"
    assert all(i is not None for i in ids)
