"""Merge-on-read deletion vectors: selective DML must cost ∝ changed
rows, not matched files.  A DV commit leaves every data file untouched
and masks deleted row positions via a broadcast anti-join at read time;
OPTIMIZE / purge materializes the debt away; auto mode picks per file
between drop (fully matched), rewrite (heavily matched), and DV (the
selective tail)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _table(spark, root, n=200, n_parts=4, partitioned=True):
    df = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % n_parts).cast("string").alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    part = ["part"] if partitioned else None
    return ParquetTable.create(spark, root, df, partition_by=part)


def _mtimes(t):
    data = os.path.join(t.root, "data")
    return {
        f: os.path.getmtime(os.path.join(data, f))
        for f in t._manifest()["files"]
    }


def test_mor_delete_touches_no_data_files(spark, root):
    t = _table(spark, root)
    before_files = list(t._manifest()["files"])
    before_mtimes = _mtimes(t)
    t.delete("k = 7", mode="merge-on-read")
    m = t._manifest()
    # identical file list, byte-identical files — only a DV was written
    assert m["files"] == before_files
    assert _mtimes(t) == before_mtimes
    assert m["dvs"], "a deletion vector must be recorded"
    # read masks the row; everything else intact
    assert t.read().filter("k = 7").count() == 0
    assert t.read().count() == 199
    # CDC sidecar carries the exact deleted row
    cdc = t._read_cdc_files(m["cdc_files"]).collect()
    assert [(r["k"], r["_change_type"]) for r in cdc] == [(7, "delete")]


def test_auto_mode_splits_drop_rewrite_dv(spark, root):
    t = _table(spark, root)  # 4 partitions x 50 rows
    # part 0: all rows match -> drop; part 1: 60% match -> rewrite;
    # part 2: 2 rows match -> DV; part 3: untouched
    t.delete("part = '0' OR (part = '1' AND k <= 120) OR (part = '2' AND k <= 6)")
    m = t._manifest()
    assert not any("part=0" in f for f in m["files"]), "full match -> dropped"
    assert all("part=1" not in f for f in m["dvs"]), "heavy match -> rewritten"
    assert any("part=2" in f for f in m["dvs"]), "selective match -> DV"
    # part=1 files were rewritten (new names), part=3 carried verbatim
    assert all("part=1" in f or "part=3" in f or "part=2" in f for f in m["files"])
    expected = 50 - 30 + 50 - 2 + 50  # part1 survivors + part2 + part3
    assert t.read().count() == expected
    assert t.read().filter("part = '1' AND k <= 120").count() == 0
    assert t.read().filter("part = '2' AND k <= 6").count() == 0


def test_dv_delete_accumulates_and_time_travel(spark, root):
    t = _table(spark, root)
    v0 = t.latest_version()
    t.delete("k = 1", mode="merge-on-read")
    v1 = t.latest_version()
    t.delete("k = 2", mode="merge-on-read")
    assert t.read().count() == 198
    # second DV merged with the first on the same file
    assert t.read().filter("k IN (1, 2)").count() == 0
    # time travel re-applies each version's own mask
    assert t.read(version=v0).count() == 200
    assert t.read(version=v1).count() == 199
    assert t.read(version=v1).filter("k = 1").count() == 0


def test_dv_probe_never_rematches_masked_rows(spark, root):
    t = _table(spark, root)
    t.delete("k < 10", mode="merge-on-read")
    # same condition again: already-masked rows must not match the
    # probe, so zero files are touched and — skipRecordingEmptyCommits
    # parity — NOTHING is committed
    v_before = t.latest_version()
    t.delete("k < 10", mode="merge-on-read")
    m = t._manifest()
    assert m["version"] == v_before, "zero-match DELETE must not commit"
    assert t.read().count() == 190


def test_mor_update_appends_post_images(spark, root):
    t = _table(spark, root)
    before_files = set(t._manifest()["files"])
    t.update("k = 13", {"v": F.lit("patched")}, mode="merge-on-read")
    m = t._manifest()
    # old files all carried; post-image appended as a new file
    assert before_files <= set(m["files"])
    added = set(m["files"]) - before_files
    assert added, "post-image file must be appended"
    assert m["dvs"], "pre-image row must be DV-masked"
    rows = t.read().filter("k = 13").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(13, "patched")]
    assert t.read().count() == 200
    # CDC carries the pre/post pair
    cdc = sorted(
        (r["_change_type"], r["v"])
        for r in t._read_cdc_files(m["cdc_files"]).collect()
    )
    assert cdc == [("update_postimage", "patched"), ("update_preimage", "v13")]


def test_optimize_purges_dvs(spark, root):
    t = _table(spark, root)
    t.delete("k = 5", mode="merge-on-read")
    assert t._manifest()["dvs"]
    t.optimize()
    m = t._manifest()
    assert m["dvs"] == {}
    assert t.read().count() == 199
    assert t.read().filter("k = 5").count() == 0


def test_purge_deletion_vectors_targets_only_masked_files(spark, root):
    t = _table(spark, root)
    t.delete("part = '2' AND k = 2", mode="merge-on-read")
    before = set(t._manifest()["files"])
    v = t.purge_deletion_vectors()
    m = t._manifest()
    assert m["version"] == v
    assert m["dvs"] == {}
    # only the masked partition's file was rewritten
    rewritten = set(m["files"]) - before
    assert rewritten and all("part=2" in f for f in rewritten)
    carried = before & set(m["files"])
    assert all("part=2" not in f for f in carried - before or carried)
    assert t.read().count() == 199
    # idempotent no-op afterwards
    assert t.purge_deletion_vectors() == v


def test_vacuum_sweeps_expired_dvs_keeps_live(spark, root):
    t = _table(spark, root)
    t.delete("k = 3", mode="merge-on-read")
    live_dvs = {
        d for rels in t._manifest()["dvs"].values() for d in rels
    }
    t.purge_deletion_vectors()
    t.vacuum(keep_versions=1)
    dv_dir = os.path.join(root, "_deletion_vectors")
    remaining = set()
    for dirpath, _d, fnames in os.walk(dv_dir):
        for fn in fnames:
            remaining.add(
                os.path.relpath(os.path.join(dirpath, fn), dv_dir)
            )
    assert remaining == set(), "purged DVs must be swept"
    # now the other order: DV still live -> vacuum keeps it
    t2 = _table(spark, root + "2")
    t2.delete("k = 3", mode="merge-on-read")
    t2.vacuum(keep_versions=1)
    assert t2.read().count() == 199, "live DV survived vacuum"
    assert live_dvs  # sanity: the first table really had DVs


def test_restore_across_dv_commit_and_cdf(spark, root):
    t = _table(spark, root)
    v0 = t.latest_version()
    t.delete("k IN (1, 2, 3)", mode="merge-on-read")
    v1 = t.latest_version()
    # CDF of the DV commit reads the sidecar: exact deletes
    ch = t.changes_between(v0, v1)
    assert sorted(r["k"] for r in ch.collect()) == [1, 2, 3]
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    # RESTORE across the DV commit brings the rows back...
    t.restore(v0)
    assert t.read().count() == 200
    # ...and CDF sees the restore as row-level inserts even though the
    # FILE set never changed (only the DV mask did)
    ch2 = t.changes_between(v1)
    assert sorted(r["k"] for r in ch2.collect()) == [1, 2, 3]
    assert {r["_change_type"] for r in ch2.collect()} == {"insert"}


def test_scan_and_bloom_respect_dvs(spark, root):
    df = (
        spark.range(200)
        .select(F.col("id").cast("int").alias("k"),
                F.concat(F.lit("u"), F.col("id")).alias("u"))
    )
    t = ParquetTable.create(spark, root, df)
    t.set_bloom_index(["u"])
    t.delete("k = 42", mode="merge-on-read")
    assert t.scan("k", lo=42, hi=42).count() == 0
    assert t.scan_eq("u", "u42").count() == 0
    assert t.scan("k", lo=40, hi=44).count() == 4


def test_catalog_mirror_materializes_dvs(spark, root):
    t = _table(spark, root)
    t.register_catalog("dv_cat_tbl")
    try:
        assert spark.sql("SELECT count(*) c FROM dv_cat_tbl").first()["c"] == 200
        t.delete("k = 11", mode="merge-on-read")
        assert (
            spark.sql("SELECT count(*) c FROM dv_cat_tbl WHERE k = 11").first()["c"]
            == 0
        )
        assert spark.sql("SELECT count(*) c FROM dv_cat_tbl").first()["c"] == 199
    finally:
        spark.sql("DROP TABLE IF EXISTS dv_cat_tbl")


def test_clone_carries_dvs(spark, root, tmp_path):
    t = _table(spark, root)
    t.delete("k = 9", mode="merge-on-read")
    c = t.clone(str(tmp_path / "clone"))
    assert c.read().count() == 199
    assert c.read().filter("k = 9").count() == 0
    # clone is independent: purging the source leaves the clone masked
    t.purge_deletion_vectors()
    t.vacuum(keep_versions=1)
    assert c.read().count() == 199


def test_merge_does_not_resurrect_dv_rows(spark, root):
    t = _table(spark, root)
    t.delete("part = '1' AND k = 5", mode="merge-on-read")
    src = spark.createDataFrame(
        [(201, "1", "new")], "k int, part string, v string"
    )
    t.merge(src, on=["part", "k"])
    assert t.read().filter("k = 5").count() == 0, "merge rewrite of the "
    "masked partition must apply the DV first"
    assert t.read().filter("k = 201").count() == 1
    # merge rewrote partition 1 -> its DV entries are gone
    assert all("part=1" not in f for f in t._manifest()["dvs"])


def test_mor_delete_on_schema_evolved_table(spark, root):
    t = _table(spark, root)
    extra = spark.createDataFrame(
        [(500, "0", "x", 1.5)], "k int, part string, v string, score double"
    )
    t.append(extra, merge_schema=True)
    t.delete("k = 500", mode="merge-on-read")
    assert t.read().filter("k = 500").count() == 0
    assert t.read().count() == 200
    # old narrow files still readable with typed NULL score
    assert t.read().filter("score IS NULL").count() == 200


@pytest.mark.parametrize(
    "cond",
    [
        "k % 7 = 3",                      # scattered selective rows
        "part = '1'",                     # whole partition
        "k < 0",                          # no match
        "part = '2' AND k <= 110",        # mixed: heavy in one partition
        "v = 'v17' OR k BETWEEN 190 AND 199",  # string + range mix
    ],
)
def test_cow_and_mor_deletes_are_semantically_identical(spark, root, cond):
    """Whatever strategy the writer picks, readers must see the same
    table: same surviving rows, same CDC delta, same count — the
    mode is a COST decision, never a semantics decision."""
    t_cow = _table(spark, root + "_cow")
    t_mor = _table(spark, root + "_mor")
    t_cow.delete(cond, mode="copy-on-write")
    t_mor.delete(cond, mode="merge-on-read")
    rows_cow = sorted(
        (r["k"], r["part"], r["v"]) for r in t_cow.read().collect()
    )
    rows_mor = sorted(
        (r["k"], r["part"], r["v"]) for r in t_mor.read().collect()
    )
    assert rows_cow == rows_mor
    cdc_cow = sorted(
        (r["k"], r["_change_type"])
        for r in t_cow.changes_between(0).collect()
    )
    cdc_mor = sorted(
        (r["k"], r["_change_type"])
        for r in t_mor.changes_between(0).collect()
    )
    assert cdc_cow == cdc_mor
    # and purging the MoR side converges to the same physical state class
    t_mor.purge_deletion_vectors()
    assert t_mor._manifest()["dvs"] == {}
    assert sorted(
        (r["k"], r["part"], r["v"]) for r in t_mor.read().collect()
    ) == rows_cow


def test_operation_metrics_in_history(spark, root):
    """Delta operationMetrics parity: each commit records what it
    touched, so maintenance dashboards don't need to replay the CDF."""
    t = _table(spark, root)
    t.delete(
        "part = '0' OR (part = '1' AND k <= 120) OR (part = '2' AND k <= 6)"
    )
    h = {c.version: c for c in t.history()}
    dm = h[1].metrics
    assert dm["rows_deleted"] == 50 + 30 + 2
    assert dm["files_dropped"] >= 1
    assert dm["files_rewritten"] >= 1 and dm["files_dv_masked"] >= 1
    t.update("k = 130", {"v": F.lit("x")})
    um = {c.version: c for c in t.history()}[2].metrics
    assert um["rows_updated"] == 1
    t.optimize()
    om = {c.version: c for c in t.history()}[3].metrics
    assert om["files_compacted"] >= 1


def test_describe_detail(spark, root):
    t = _table(spark, root)
    t.delete("k = 3", mode="merge-on-read")
    d = t.detail()
    assert d["version"] == 1 and d["num_files"] == len(t._manifest()["files"])
    assert d["size_bytes"] > 0
    assert d["partition_columns"] == ["part"]
    assert d["num_dv_masked_files"] == 1 and d["num_dv_sidecars"] >= 1
    assert d["column_mapping"] == {} and d["retired_columns"] == []
    assert d["created_at"] <= d["last_modified"]
