"""FSCK REPAIR TABLE + VACUUM DRY RUN (`tables.fsck` / `vacuum(dry_run)`)."""

from __future__ import annotations

import os

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, cat string"),
    )
    t.append(spark.createDataFrame([(3, "c")], "id int, cat string"))
    return t


def test_fsck_repairs_missing_file(spark, table):
    m = table._manifest()
    victim = next(f for f in m["files"])
    os.remove(os.path.join(table.root, "data", victim))
    with pytest.raises(Exception):
        table.read().collect()  # missing file breaks reads
    dry = table.fsck(dry_run=True)
    assert dry["missing_files"] == [victim]
    assert table.latest_version() == m["version"]  # dry run commits nothing
    res = table.fsck()
    assert res["missing_files"] == [victim]
    assert res["version"] == m["version"] + 1
    survivors = {r.id for r in table.read().collect()}
    assert len(survivors) > 0 and 3 in survivors or survivors  # readable again
    # healthy table: fsck is a no-op
    again = table.fsck()
    assert again["missing_files"] == [] and again["version"] == res["version"]


def test_cdf_raises_across_fsck(spark, table):
    v0 = table.latest_version()
    victim = table._manifest()["files"][0]
    os.remove(os.path.join(table.root, "data", victim))
    table.fsck()
    with pytest.raises(ValueError, match="FSCK repair"):
        table.changes_between(v0 - 1).collect()


def test_vacuum_dry_run_counts_without_deleting(spark, table):
    table.overwrite(spark.createDataFrame([(9, "z")], "id int, cat string"))
    would = table.vacuum(dry_run=True)
    assert would > 0
    # nothing actually deleted: time travel still works
    assert table.read(version=0).count() == 2
    real = table.vacuum()
    assert real == would
    with pytest.raises(Exception):
        table.read(version=0).collect()


def test_sql_forms(spark, tmp_path, table):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    lh.register("t", table.root)
    victim = table._manifest()["files"][0]
    os.remove(os.path.join(table.root, "data", victim))
    dry = lh.sql("FSCK REPAIR TABLE t DRY RUN").collect()[0]
    assert (dry.missing_files, dry.dry_run) == (1, True)
    fixed = lh.sql("FSCK REPAIR TABLE t").collect()[0]
    assert fixed.missing_files == 1 and not fixed.dry_run
    # make garbage: overwrite orphans the surviving pre-overwrite files
    lh.sql("INSERT OVERWRITE t SELECT 9 AS id, 'z' AS cat")
    out = lh.sql("VACUUM t RETAIN 0 HOURS DRY RUN").collect()[0]
    assert out.dry_run and out.files_deleted >= 1
    # dry run deleted nothing: the real run still finds the same set
    real = lh.sql("VACUUM t RETAIN 0 HOURS").collect()[0]
    assert real.files_deleted == out.files_deleted
    assert {r.id for r in lh.sql("SELECT id FROM t").collect()} == {9}
