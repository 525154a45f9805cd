"""File-pruned DML + incremental OPTIMIZE: selective DELETE/UPDATE must
rewrite only the files that contain matches (everything else carries by
reference), CDC sidecars must record the exact row deltas, and OPTIMIZE
must be an incremental, scopeable maintenance op — the behaviors that
keep table maintenance cost ∝ change, not table, at 100 TB."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _part_table(spark, root, n_parts=4, rows_per_part=50):
    df = spark.range(n_parts * rows_per_part).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % n_parts).cast("string").alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    return ParquetTable.create(spark, root, df, partition_by=["part"])


def test_selective_delete_rewrites_only_matching_files(spark, root):
    """Forced copy-on-write (the auto default would take the cheaper
    deletion-vector path for a 1-of-50 match — tests/test_dvs.py)."""
    t = _part_table(spark, root)
    before = set(t._manifest()["files"])
    assert len(before) >= 4
    t.delete("part = '2' AND k = 2", mode="copy-on-write")
    m = t._manifest()
    after = set(m["files"])
    # every file of the untouched partitions carries over BY REFERENCE
    untouched_before = {f for f in before if "part=2" not in f}
    assert untouched_before <= after
    rewritten = after - before
    assert 0 < len(rewritten) < len(before)
    assert all("part=2" in f for f in rewritten)
    # CDC sidecar holds exactly the deleted row
    assert m["cdc_files"]
    cdc = t._read_cdc_files(m["cdc_files"]).collect()
    assert [(r["k"], r["_change_type"]) for r in cdc] == [(2, "delete")]
    # data correct; stats carried for untouched files
    assert t.read().count() == 199
    assert t.read().filter("k = 2").count() == 0
    assert all(f in t._stats(m) for f in untouched_before)


def test_delete_with_column_condition_still_narrows_rewrite(spark, root):
    """No SQL string -> no metadata pruning, but the probe phase still
    finds the files that actually match, so the rewrite stays narrow."""
    t = _part_table(spark, root)
    before = set(t._manifest()["files"])
    t.delete((F.col("part") == "1") & (F.col("k") == 1))
    after = set(t._manifest()["files"])
    assert {f for f in before if "part=1" not in f} <= after
    assert t.read().count() == 199


def test_zordered_delete_touches_few_files(spark, root):
    df = spark.range(2000).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    t = ParquetTable.create(spark, root, df)
    t.optimize(zorder_by=["k"], n_files=16)
    before = set(t._manifest()["files"])
    assert len(before) >= 8
    t.delete("k BETWEEN 100 AND 110")
    after = set(t._manifest()["files"])
    carried = before & after
    # z-ordering keeps [100, 110] inside a couple of files; the rest
    # must carry over untouched
    assert len(before - after) <= 3
    assert len(carried) >= len(before) - 3
    assert t.read().count() == 2000 - 11


def test_update_prunes_and_records_pre_post_images(spark, root):
    t = _part_table(spark, root)
    before = set(t._manifest()["files"])
    t.update("part = '3' AND k = 3", {"v": F.lit("patched")})
    m = t._manifest()
    after = set(m["files"])
    assert {f for f in before if "part=3" not in f} <= after
    cdc = t._read_cdc_files(m["cdc_files"]).collect()
    images = {(r["_change_type"], r["v"]) for r in cdc}
    assert images == {
        ("update_preimage", "v3"),
        ("update_postimage", "patched"),
    }
    assert t.read().filter("k = 3").collect()[0]["v"] == "patched"
    # batch CDF rides the sidecar and maps to the delete/insert contract
    got = {
        (r["_change_type"], r["v"])
        for r in t.changes_between(t.latest_version() - 1).collect()
    }
    assert got == {("delete", "v3"), ("insert", "patched")}


def test_no_match_delete_carries_everything(spark, root):
    t = _part_table(spark, root)
    before = t._manifest()["files"]
    t.delete("k = 999999")
    m = t._manifest()
    assert m["files"] == before  # zero files rewritten
    assert m["cdc_files"] == []


def test_optimize_is_incremental_and_idempotent(spark, root):
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"), F.lit("x").alias("v")
    )
    t = ParquetTable.create(spark, root, df.repartition(8))
    assert len(t._manifest()["files"]) == 8
    v1 = t.optimize()  # compacts the 8 small files
    assert len(t._manifest()["files"]) == 1
    # second run: nothing below target in groups of >= 2 -> NO new commit
    assert t.optimize() == v1
    assert t.latest_version() == v1
    # appends create new small files; the next optimize touches ONLY the
    # small group, never re-reading what is already compact
    t.append(df.limit(10).repartition(2))
    t.append(df.limit(10).repartition(2))
    big = set(t._manifest()["files"]) - {
        f for f in t._manifest()["files"] if os.path.getsize(
            os.path.join(root, "data", f)
        ) < 1024 * 1024
    }
    t.optimize()
    assert t.read().count() == 220


def test_optimize_where_scopes_partitions(spark, root):
    t = _part_table(spark, root)
    # fragment two partitions with extra small appends
    extra = spark.range(20).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 2).cast("string").alias("part"),
        F.lit("e").alias("v"),
    )
    t.append(extra)
    t.append(extra)
    before = set(t._manifest()["files"])
    t.optimize(where="part = '0'")
    after = set(t._manifest()["files"])
    # partition 1 is also fragmented but out of scope: untouched
    assert {f for f in before if "part=1" in f} <= after
    assert {f for f in before if "part=0" in f} - after  # 0 compacted
    assert t.read().count() == 240


def test_optimize_where_unprunable_raises(spark, root):
    t = _part_table(spark, root)
    with pytest.raises(ValueError, match="not prunable"):
        t.optimize(where="k % 2 = 0")


def test_bloom_index_correct_on_partitioned_table(spark, root):
    """Regression: dynamic-partition writes reuse a task's part-file
    basename in EVERY partition directory it touches, so bloom bitmaps
    keyed by basename could land on the wrong file and produce false
    negatives.  Full-path mapping must keep every present key findable."""
    t = _part_table(spark, root)
    t.set_bloom_index(["v"], m_bits=2048, k=4)
    for k in (0, 1, 37, 150, 199):
        got = t.scan_eq("v", f"v{k}").collect()
        assert len(got) == 1 and got[0]["k"] == k
    assert t.scan_eq("v", "nope").count() == 0


def test_vacuum_sweeps_expired_cdc_sidecars(spark, root):
    t = _part_table(spark, root, n_parts=2, rows_per_part=5)
    t.delete("k = 1")  # v1 writes a sidecar
    cdc_dir = os.path.join(root, "_change_data")
    assert any(f.endswith(".parquet") for _, _, fs in os.walk(cdc_dir) for f in fs)
    t.append(
        spark.createDataFrame([(99, "0", "z")], "k int, part string, v string")
    )  # v2
    t.vacuum(keep_versions=1)  # horizon drops v1's manifest
    remaining = [
        f for _, _, fs in os.walk(cdc_dir) for f in fs if f.endswith(".parquet")
    ]
    assert remaining == []


def test_scan_where_prunes_on_partitions_and_stats(spark, root):
    """General-predicate data skipping: partition dirs and footer stats
    both prune before the exact filter runs; unprunable shapes degrade
    to a full (correct) read."""
    t = _part_table(spark, root)
    # partition prune: only part=1 files survive the metadata pass
    kept = t._prune_files(
        t._manifest(),
        __import__(
            "azure_databricks_lakehouse_spark.plans.pruning",
            fromlist=["parse_predicate"],
        ).parse_predicate("part = '1' AND k BETWEEN 0 AND 10"),
    )
    assert kept and all("part=1" in f for f in kept)
    rows = t.scan_where("part = '1' AND k BETWEEN 0 AND 10").collect()
    assert sorted(r["k"] for r in rows) == [1, 5, 9]
    # stats prune: impossible range opens zero files but stays correct
    assert t.scan_where("k > 1000000").count() == 0
    # unprunable shape (function call) degrades to full read, right answer
    assert t.scan_where("length(v) >= 2 AND k = 7").count() == 1
    # respects deletion vectors
    t.delete("k = 5", mode="merge-on-read")
    assert t.scan_where("part = '1' AND k BETWEEN 0 AND 10").count() == 2


def test_dml_on_percent_encoded_partition_values(spark, root):
    """Hive partition values Spark percent-encodes on disk (':' ->
    '%3A') are double-encoded in file URIs; the URI-prefix probe and
    the DV (file, row) attribution must survive that.  Regression for
    the round-5 advice on _uri_prefix's raw-suffix match."""
    from azure_databricks_lakehouse_spark.sources import tables as T

    df = spark.createDataFrame(
        [(i, f"h:{i % 2}", i * 10) for i in range(40)],
        "k int, part string, v int",
    )
    t = ParquetTable.create(spark, root, df, partition_by=["part"])
    # bust the session cache so the probe actually runs on THIS table
    T._URI_PREFIX_CACHE.clear()
    # merge-on-read: one-row delete writes a DV keyed by URI suffix
    t.delete(F.col("k") == 7, mode="merge-on-read")
    got = t.read()
    assert got.count() == 39
    assert got.filter("k = 7").count() == 0
    assert got.filter("part = 'h:1'").count() == 19
    # update through the same probe path
    t.update("k = 8", {"v": F.lit(-1)}, mode="merge-on-read")
    assert t.read().filter("v = -1").count() == 1


def test_generated_date_partition_prunes_timestamp_predicates(spark, root):
    """Delta's generated-column partition pruning: the table is
    partitioned by a DATE column GENERATED ALWAYS AS to_date(ts).
    Timestamp columns have no footer stats, so without the implication
    a ts predicate reads every file; with it, only the implied days'
    partitions survive the metadata prune — and DELETE rides the same
    path, rewriting only the matched day."""
    from azure_databricks_lakehouse_spark.plans.pruning import parse_predicate

    df = spark.createDataFrame(
        [
            (i, f"2026-08-{10 + d:02d} 0{i % 8}:30:00")
            for d in range(4)
            for i in range(d * 10, d * 10 + 10)
        ],
        "k int, ts_s string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    df = df.withColumn("day", F.to_date("ts"))
    t = ParquetTable.create(spark, root, df, partition_by=["day"])
    t.set_generated("day", "to_date(ts)")

    m = t._manifest()
    all_files = m["files"]
    days = {f.split("/")[0] for f in all_files}
    assert days == {f"day=2026-08-{10 + d}" for d in range(4)}

    kept = t._prune_files(
        m, parse_predicate("ts >= '2026-08-12 05:00:00'")
    )
    assert {f.split("/")[0] for f in kept} == {
        "day=2026-08-12",
        "day=2026-08-13",
    }
    # boundary day included on a <-bound (relaxed to <=)
    kept = t._prune_files(m, parse_predicate("ts < '2026-08-11 02:00:00'"))
    assert {f.split("/")[0] for f in kept} == {
        "day=2026-08-10",
        "day=2026-08-11",
    }
    # results stay exact after pruning
    assert t.scan_where("ts >= '2026-08-12 05:00:00'").count() == sum(
        1
        for d in range(4)
        for i in range(10)
        if f"2026-08-{10 + d:02d} 0{(d * 10 + i) % 8}:30:00"
        >= "2026-08-12 05:00:00"
    )
    # DELETE rides the same prune: only the matched day's files rewrite
    before = set(all_files)
    t.delete("ts >= '2026-08-13 00:00:00'")
    after = set(t._manifest()["files"])
    assert {f.split("/")[0] for f in before - after} == {"day=2026-08-13"}
    assert t.read().count() == 30
