"""Auto-compaction (Delta ``autoCompact`` parity): appends on a table
with the property keep small-file debt bounded via a scoped follow-up
OPTIMIZE commit; untouched partitions are never rewritten; without the
property debt grows linearly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, root, *, auto: bool):
    df = spark.range(20).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 2).cast("string").alias("part"),
    )
    t = ParquetTable.create(spark, root, df, partition_by=["part"])
    if auto:
        t.set_properties(
            {"autoCompact": {"target_file_mb": 16, "min_small_files": 4}}
        )
    return t


def _batch(spark, i, part="0"):
    return spark.createDataFrame(
        [(100 * i + j, part) for j in range(3)], "k int, part string"
    )


def _files_in(t, part):
    return [f for f in t._manifest()["files"] if f"part={part}" in f]


def test_appends_trigger_scoped_compaction(spark, root):
    t = _mk(spark, root, auto=True)
    part1_before = set(_files_in(t, "1"))
    grew_past_threshold = False
    for i in range(6):
        n_before = len(_files_in(t, "0"))
        t.append(_batch(spark, i, part="0"))
        n_after = len(_files_in(t, "0"))
        if n_after < n_before + 1:
            grew_past_threshold = True  # a compaction collapsed the dir
    assert grew_past_threshold, "small-file debt never compacted"
    # debt stays bounded below the trigger + the fresh append
    assert len(_files_in(t, "0")) <= 5
    # the untouched partition is byte-identical (same manifest entries)
    assert set(_files_in(t, "1")) == part1_before
    # compaction is a real follow-up commit in the history
    ops = [h.operation for h in t.history()]
    assert "OPTIMIZE" in ops and "APPEND" in ops
    # and the data survived intact
    got = sorted(
        r["k"] for r in t.read().filter(F.col("part") == "0").collect()
    )
    expect = sorted(
        [k for k in range(20) if k % 2 == 0] + [100 * i + j for i in range(6) for j in range(3)]
    )
    assert got == expect


def test_without_property_debt_grows(spark, root):
    t = _mk(spark, root, auto=False)
    base = len(_files_in(t, "0"))
    for i in range(6):
        t.append(_batch(spark, i, part="0"))
    assert len(_files_in(t, "0")) == base + 6
    assert "OPTIMIZE" not in [h.operation for h in t.history()]


def test_partitions_scope_on_optimize(spark, root):
    """The partitions= knob compacts exactly the named dirs."""
    t = _mk(spark, root, auto=False)
    for i in range(3):
        t.append(_batch(spark, i, part="0"))
        t.append(_batch(spark, 10 + i, part="1"))
    p0 = _files_in(t, "0")
    p1 = set(_files_in(t, "1"))
    assert len(p0) == 4 and len(p1) == 4
    t.optimize(target_file_mb=16, partitions=[os.path.dirname(p0[0])])
    assert len(_files_in(t, "0")) == 1
    assert set(_files_in(t, "1")) == p1
