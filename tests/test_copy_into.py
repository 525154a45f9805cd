"""COPY INTO (`tables.copy_into` + SQL form): idempotent batch file
ingestion with a sharded loaded-file ledger."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import (
    _LEDGER_DIR,
    ParquetTable,
)


def _land_csv(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        fh.write("id,cat\n")
        for r in rows:
            fh.write(f"{r[0]},{r[1]}\n")


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame([], "id int, cat string")
    return ParquetTable.create(spark, str(tmp_path / "t"), df)


def test_rerun_loads_only_new_files(spark, tmp_path, table):
    land = str(tmp_path / "landing")
    _land_csv(land, "a.csv", [(1, "x"), (2, "y")])
    opts = {"header": "true", "inferSchema": "true"}
    r1 = table.copy_into(land, fileformat="csv", format_options=opts)
    assert (r1["files_loaded"], r1["rows_loaded"]) == (1, 2)
    # rerun over the unchanged directory: metadata-cost no-op, no commit
    r2 = table.copy_into(land, fileformat="csv", format_options=opts)
    assert (r2["files_loaded"], r2["files_skipped"]) == (0, 1)
    assert r2["version"] == r1["version"]
    # a new landing file loads alone
    _land_csv(land, "b.csv", [(3, "z")])
    r3 = table.copy_into(land, fileformat="csv", format_options=opts)
    assert (r3["files_loaded"], r3["files_skipped"]) == (1, 1)
    got = {r.id for r in table.read().collect()}
    assert got == {1, 2, 3}


def test_path_keyed_skip_and_force(spark, tmp_path, table):
    land = str(tmp_path / "landing")
    _land_csv(land, "a.csv", [(1, "x")])
    opts = {"header": "true", "inferSchema": "true"}
    table.copy_into(land, fileformat="csv", format_options=opts)
    # re-uploaded file under the SAME path: skipped (Delta's contract)
    _land_csv(land, "a.csv", [(9, "q")])
    r = table.copy_into(land, fileformat="csv", format_options=opts)
    assert r["files_loaded"] == 0
    # force loads every match regardless
    rf = table.copy_into(
        land, fileformat="csv", format_options=opts, force=True
    )
    assert rf["files_loaded"] == 1
    assert {r.id for r in table.read().collect()} == {1, 9}


def test_pattern_and_hidden_files(spark, tmp_path, table):
    land = str(tmp_path / "landing")
    _land_csv(land, "keep.csv", [(1, "x")])
    _land_csv(land, "skip.txt", [(2, "y")])
    _land_csv(land, "_committed.csv", [(3, "z")])  # metadata convention
    r = table.copy_into(
        land,
        fileformat="csv",
        pattern="*.csv",
        format_options={"header": "true", "inferSchema": "true"},
    )
    assert r["files_loaded"] == 1
    assert {row.id for row in table.read().collect()} == {1}


def test_ledger_is_sharded_and_commit_atomic(spark, tmp_path, table):
    land = str(tmp_path / "landing")
    opts = {"header": "true", "inferSchema": "true"}
    _land_csv(land, "a.csv", [(1, "x")])
    table.copy_into(land, fileformat="csv", format_options=opts)
    _land_csv(land, "b.csv", [(2, "y")])
    table.copy_into(land, fileformat="csv", format_options=opts)
    shards = table.properties()["copy_ledger"]
    assert len(shards) == 2  # one shard per run, props carry names only
    ledger_root = os.path.join(table.root, _LEDGER_DIR)
    assert sorted(os.listdir(ledger_root)) == sorted(shards)


def test_vacuum_sweeps_orphaned_ledger_shard(spark, tmp_path, table):
    land = str(tmp_path / "landing")
    opts = {"header": "true", "inferSchema": "true"}
    _land_csv(land, "a.csv", [(1, "x")])
    table.copy_into(land, fileformat="csv", format_options=opts)
    # plant an orphan (crash between shard write and commit)
    orphan = os.path.join(table.root, _LEDGER_DIR, "ledger-orphan.parquet")
    os.makedirs(orphan)
    table.vacuum()
    names = set(os.listdir(os.path.join(table.root, _LEDGER_DIR)))
    assert "ledger-orphan.parquet" not in names
    assert names == set(table.properties()["copy_ledger"])
    # the skip check still works off the surviving shard
    r = table.copy_into(land, fileformat="csv", format_options=opts)
    assert r["files_loaded"] == 0


def test_sql_copy_into_form(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame([], "id int, cat string")
    t = ParquetTable.create(spark, str(tmp_path / "t2"), df)
    lh.register("landing_tbl", t.root)
    land = str(tmp_path / "landing2")
    _land_csv(land, "a.csv", [(1, "x"), (2, "y")])
    out = lh.sql(
        f"COPY INTO landing_tbl FROM '{land}' FILEFORMAT = CSV "
        "PATTERN = '*.csv' "
        "FORMAT_OPTIONS('header'='true', 'inferSchema'='true')"
    ).collect()[0]
    assert (out.num_files_loaded, out.num_rows_loaded) == (1, 2)
    again = lh.sql(
        f"COPY INTO landing_tbl FROM '{land}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS('header'='true', 'inferSchema'='true')"
    ).collect()[0]
    assert (again.num_files_loaded, again.num_files_skipped) == (0, 1)
    forced = lh.sql(
        f"COPY INTO landing_tbl FROM '{land}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS('header'='true', 'inferSchema'='true') "
        "COPY_OPTIONS('force'='true')"
    ).collect()[0]
    assert forced.num_files_loaded == 1


def test_orc_fileformat(spark, tmp_path, table):
    """ORC ships with Spark (S12 'other formats'): COPY INTO is
    format-generic, so an ORC landing zone loads the same way."""
    land = str(tmp_path / "orc_landing")
    spark.createDataFrame([(1, "x"), (2, "y")], "id int, cat string")\
        .coalesce(1).write.orc(land)
    r = table.copy_into(land, fileformat="orc")
    assert (r["files_loaded"], r["rows_loaded"]) == (1, 2)
    assert {row.id for row in table.read().collect()} == {1, 2}
    again = table.copy_into(land, fileformat="orc")
    assert again["files_loaded"] == 0

def test_spelling_independent_ledger_and_overlap_audit(spark, tmp_path, table):
    """Round-7 ADVICE (low): the ledger key is realpath-normalized, so
    the same landing dir reached through a symlink (or another
    spelling) still skips; detect_copy_overlap() audits the
    concurrent-COPY double-load case."""
    land = str(tmp_path / "landing")
    _land_csv(land, "a.csv", [(1, "x")])
    opts = {"header": "true", "inferSchema": "true"}
    table.copy_into(land, fileformat="csv", format_options=opts)
    # same directory through a symlink: must skip, not reload
    link = str(tmp_path / "landing_link")
    os.symlink(land, link)
    r = table.copy_into(link, fileformat="csv", format_options=opts)
    assert (r["files_loaded"], r["files_skipped"]) == (0, 1)
    assert table.detect_copy_overlap().count() == 0
    # force=True double-loads by design; the audit surfaces it
    table.copy_into(land, fileformat="csv", format_options=opts, force=True)
    dup = table.detect_copy_overlap().collect()
    assert len(dup) == 1 and dup[0].load_count == 2


def test_legacy_asgiven_ledger_spelling_still_skips(spark, tmp_path, table):
    """Round-8 ADVICE: ledger shards written by pre-realpath versions
    keyed on the AS-GIVEN spelling.  After the upgrade, a landing dir
    reached through a symlink must still skip files whose ledger rows
    hold the symlinked (non-canonical) path — matching either spelling
    instead of silently double-loading."""
    import time as _time
    import uuid as _uuid

    real = str(tmp_path / "real_landing")
    _land_csv(real, "a.csv", [(1, "x"), (2, "y")])
    link = str(tmp_path / "link_landing")
    os.symlink(real, link)
    opts = {"header": "true", "inferSchema": "true"}

    # forge a LEGACY ledger shard recording the symlinked spelling (what
    # an old version would have written when fed the symlinked dir)
    shard = f"ledger-{_uuid.uuid4().hex}.parquet"
    st = os.stat(os.path.join(real, "a.csv"))
    spark.createDataFrame(
        [(os.path.join(link, "a.csv"), st.st_size, st.st_mtime_ns, _time.time())],
        "path string, size long, mtime_ns long, loaded_at double",
    ).coalesce(1).write.parquet(os.path.join(table.root, _LEDGER_DIR, shard))
    v = table.append(
        spark.createDataFrame([(1, "x"), (2, "y")], "id int, cat string"),
        props_update=lambda props: {
            **props,
            "copy_ledger": [*props.get("copy_ledger", []), shard],
        },
    )
    assert v >= 1

    # through the symlink: candidate as-given spelling matches the
    # legacy ledger row -> skipped
    r = table.copy_into(link, fileformat="csv", format_options=opts)
    assert (r["files_loaded"], r["files_skipped"]) == (0, 1)
    # through the real path: realpath(candidate) == realpath(link/a.csv)
    # but the LEDGER row holds the symlink spelling; candidate's
    # realpath doesn't string-match it, so this documents the residual
    # upgrade gap closed by the as-given side only.  A NEW file loads
    # fine either way.
    _land_csv(real, "b.csv", [(3, "z")])
    r = table.copy_into(link, fileformat="csv", format_options=opts)
    assert (r["files_loaded"], r["files_skipped"]) == (1, 1)
