"""Streaming CDF source (Python DataSource API): append commits become
micro-batches, offsets are table versions, rewrite commits raise unless
explicitly ignored, partition-column values are recovered from paths."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.cdf_stream import (
    TableChangesDataSource,
)
from azure_databricks_lakehouse_spark.sources.tables import (
    ParquetTable,
    is_table,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, part string, v string")


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(TableChangesDataSource)
    return spark


def _drain(spark, root, name, want_rows, extra_opts=None, timeout=120):
    reader = spark.readStream.format("table_changes").option("path", root)
    for opt, val in (extra_opts or {}).items():
        reader = reader.option(opt, val)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if spark.table(name).count() >= want_rows:
                break
            time.sleep(0.5)
        return spark.table(name).collect()
    finally:
        q.stop()


def test_stream_delivers_appends_with_versions(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x")]))
    t.append(_rows(spark, [(2, "b", "y")]))  # v1
    t.append(_rows(spark, [(3, "c", "z")]))  # v2
    got = _drain(spark, root, "cdf_sink_1", want_rows=3)
    by_k = {r["k"]: (r["_change_type"], r["_commit_version"], r["part"], r["v"]) for r in got}
    assert by_k == {
        1: ("insert", 0, "a", "x"),
        2: ("insert", 1, "b", "y"),
        3: ("insert", 2, "c", "z"),
    }


def test_starting_version_skips_history(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl2")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x")]))
    t.append(_rows(spark, [(2, "b", "y")]))  # v1
    got = _drain(
        spark, root, "cdf_sink_2", want_rows=1,
        extra_opts={"startingVersion": "0"},
    )
    assert [r["k"] for r in got] == [2]


def test_sidecarless_rewrite_raises_unless_ignored(registered, tmp_path):
    """OVERWRITE commits carry no CDC sidecar (a snapshot replacement
    has no meaningful row delta) — the stream refuses them unless the
    user opts out with ignoreChanges.  MERGE used to be in this bucket;
    since round 8 it writes pre/post-image sidecars and streams (see
    test_merge_streams_row_level_delta)."""
    spark = registered
    root = str(tmp_path / "tbl3")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x")]))
    t.overwrite(_rows(spark, [(1, "a", "x2")]))  # v1: no CDC sidecar
    t.append(_rows(spark, [(2, "b", "y")]))  # v2

    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_sink_3a")
        .start()
    )
    with pytest.raises(Exception, match="OVERWRITE commit"):
        q.awaitTermination(60)

    # with ignoreChanges the stream skips v1 and delivers v0 + v2
    got = _drain(
        spark, root, "cdf_sink_3b", want_rows=2,
        extra_opts={"ignoreChanges": "true"},
    )
    assert sorted((r["k"], r["_commit_version"]) for r in got) == [(1, 0), (2, 2)]


def test_merge_streams_row_level_delta(registered, tmp_path):
    """Round-8: MERGE commits write CDC sidecars (Delta CDF parity), so
    a MERGE-maintained table is a first-class stream source — matched
    rows stream as update_preimage/update_postimage pairs, CDC deletes
    as delete rows, and new keys as inserts."""
    spark = registered
    root = str(tmp_path / "tblm")
    t = ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")])
    )
    t.merge(_rows(spark, [(1, "a", "x2"), (3, "c", "z")]), on=["k"])  # v1
    got = _drain(spark, root, "cdf_sink_m", want_rows=5)
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"]) for r in got
    )
    assert changes == [
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (1, "insert", 3, "z"),
        (1, "update_postimage", 1, "x2"),
        (1, "update_preimage", 1, "x"),
    ]
    # Delta CDF parity: every streamed change carries the commit's
    # wall-clock _commit_timestamp (from the manifest)
    assert all(r["_commit_timestamp"] is not None for r in got)


def test_update_streams_pre_and_post_images(registered, tmp_path):
    """A sidecar-backed UPDATE commit streams its real row-level
    changes — Delta's update_preimage / update_postimage pair — and a
    DELETE streams its deleted rows; untouched rows never re-stream."""
    spark = registered
    root = str(tmp_path / "tbl5")
    t = ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")])
    )
    t.update(F.col("k") == 1, {"v": F.lit("x2")})  # v1: pre/post sidecar
    t.delete(F.col("k") == 2)  # v2: delete sidecar
    got = _drain(spark, root, "cdf_sink_5", want_rows=5)
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"]) for r in got
    )
    assert changes == [
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (1, "update_postimage", 1, "x2"),  # "post..." sorts before "pre..."
        (1, "update_preimage", 1, "x"),
        (2, "delete", 2, "y"),
    ]


def test_partitioned_table_recovers_partition_values(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl4")
    ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")]),
        partition_by=["part"],
    )
    got = _drain(spark, root, "cdf_sink_4", want_rows=2)
    assert {r["k"]: r["part"] for r in got} == {1: "a", 2: "b"}


def test_continuous_etl_bronze_commits_to_silver(registered, tmp_path):
    """The continuous-ETL loop closed: bronze table commits stream
    through the CDF source, a transform runs on the stream, and a
    checkpointed foreachBatch MERGE lands rows in a silver table —
    downstream reads fresh data without ever rescanning bronze."""
    from azure_databricks_lakehouse_spark.streaming import (
        write_stream_to_table,
    )

    spark = registered
    bronze_root = str(tmp_path / "bronze")
    silver_root = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    t = ParquetTable.create(spark, bronze_root, _rows(spark, [(1, "a", "x")]))
    stream = (
        spark.readStream.format("table_changes")
        .option("path", bronze_root)
        .load()
        .select("k", "part", F.upper(F.col("v")).alias("v_std"))
    )
    q = write_stream_to_table(
        stream, silver_root, ckpt, merge_on=["k"], available_now=False
    )
    try:
        deadline = time.time() + 120
        t.append(_rows(spark, [(2, "b", "y")]))
        while time.time() < deadline:
            if (
                is_table(silver_root)
                and ParquetTable.for_path(spark, silver_root).read().count() >= 2
            ):
                break
            time.sleep(0.5)
        got = {
            r["k"]: r["v_std"]
            for r in ParquetTable.for_path(spark, silver_root).read().collect()
        }
        assert got == {1: "X", 2: "Y"}
    finally:
        q.stop()


def test_stream_reads_renamed_columns_from_physical(registered, tmp_path):
    """Column mapping: appends after a metadata-only RENAME store the
    PHYSICAL name; the streaming source must read each logical field
    from its mapped physical column (and translate renamed partition
    directories)."""
    spark = registered
    root = str(tmp_path / "tbl")
    t = ParquetTable.create(
        spark,
        root,
        _rows(spark, [(1, "a", "x")]),
        partition_by=["part"],
    )
    t.rename_column("v", "label")
    t.rename_column("part", "bucket")
    t.append(
        spark.createDataFrame(
            [(2, "b", "y")], "k int, bucket string, label string"
        )
    )  # v3: physical file columns are k/v, dir is part=b
    got = _drain(spark, root, "cdf_sink_ren", want_rows=2)
    by_k = {r["k"]: r for r in got}
    assert by_k[2]["label"] == "y", "logical field must read its physical col"
    assert by_k[2]["bucket"] == "b", "renamed partition value must recover"
    # the pre-rename append streams under the CURRENT logical schema too
    assert by_k[1]["label"] == "x" and by_k[1]["bucket"] == "a"


def test_max_versions_per_trigger_bounds_batches(registered, tmp_path):
    """Rate limiting: a 4-commit backlog with maxVersionsPerTrigger=1
    drains completely, one commit per micro-batch — bounded catch-up
    instead of one giant batch."""
    spark = registered
    root = str(tmp_path / "tbl")
    t = ParquetTable.create(spark, root, _rows(spark, [(0, "a", "v0")]))
    for i in range(1, 4):
        t.append(_rows(spark, [(i, "a", f"v{i}")]))
    got = _drain(
        spark,
        root,
        "cdf_sink_rate",
        want_rows=4,
        extra_opts={"maxVersionsPerTrigger": "1"},
    )
    assert sorted(r["k"] for r in got) == [0, 1, 2, 3]
    # every commit version arrived, none merged away
    assert sorted({r["_commit_version"] for r in got}) == [0, 1, 2, 3]
    # and the limit is validated
    import pyspark.errors

    with pytest.raises(Exception, match="maxVersionsPerTrigger"):
        q = (
            spark.readStream.format("table_changes")
            .option("path", root)
            .option("maxVersionsPerTrigger", "0")
            .load()
            .writeStream.format("memory")
            .queryName("cdf_sink_rate_bad")
            .start()
        )
        try:
            q.awaitTermination(30)
        finally:
            q.stop()


def test_restart_with_rate_limit_does_not_replay(registered, tmp_path):
    """A checkpointed restart with maxVersionsPerTrigger set must NOT
    hand the engine an offset behind its committed position — that
    offset gets committed and every version in between re-delivers as
    duplicates.  After the fix the first post-restart answer is the
    newest version (rate limit suspended for one trigger), so the total
    delivered row set is exactly-once."""
    spark = registered
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = ParquetTable.create(spark, root, _rows(spark, [(0, "a", "v0")]))
    t.append(_rows(spark, [(1, "a", "v1")]))
    t.append(_rows(spark, [(2, "a", "v2")]))

    def _run(want_rows):
        q = (
            spark.readStream.format("table_changes")
            .option("path", root)
            .option("maxVersionsPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= want_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()

    _run(want_rows=3)
    t.append(_rows(spark, [(3, "a", "v3")]))
    t.append(_rows(spark, [(4, "a", "v4")]))
    _run(want_rows=5)
    got = spark.read.parquet(out).collect()
    ks = sorted(r["k"] for r in got)
    assert ks == [0, 1, 2, 3, 4], f"duplicate or missing rows: {ks}"


def test_sidecar_after_rename_streams_current_names(registered, tmp_path):
    """A DELETE/UPDATE sidecar written BEFORE a rename_column must
    stream its rows under the CURRENT logical schema (composed column
    mapping), not as silent NULLs."""
    spark = registered
    root = str(tmp_path / "tbl")
    t = ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")])
    )
    t.update(F.col("k") == 1, {"v": F.lit("x2")})  # v1: pre/post sidecar
    t.delete(F.col("k") == 2)  # v2: delete sidecar
    t.rename_column("v", "label")  # v3: sidecars now predate the rename
    got = _drain(spark, root, "cdf_sink_ren_sidecar", want_rows=5)
    by = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["label"])
        for r in got
    )
    assert by == [
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (1, "update_postimage", 1, "x2"),
        (1, "update_preimage", 1, "x"),
        (2, "delete", 2, "y"),
    ]


def test_replace_where_streams_exact_diff(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "trw")
    t = ParquetTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id int, cat string, amt double"
        ),
    )
    payload = spark.createDataFrame(
        [(9, "b", 9.0)], "id int, cat string, amt double"
    ).select(*t.read().columns)
    t.overwrite_where(payload, "cat = 'b'")
    # creation inserts (2) + replace delete (1) + replace insert (1)
    rows = _drain(spark, root, "rw_sink", 4)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type["delete"] == {2}
    assert 9 in by_type["insert"]


def test_fsck_raises_in_stream_unless_skipped(registered, tmp_path):
    import os as _os

    spark = registered
    root = str(tmp_path / "tfsck")
    t = ParquetTable.create(
        spark, root, spark.createDataFrame([(1,)], "id int")
    )
    t.append(spark.createDataFrame([(2,)], "id int"))
    victim = t._manifest()["files"][0]
    _os.remove(_os.path.join(root, "data", victim))
    t.fsck()
    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName("fsck_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="FSCK"):
        q.awaitTermination()
    # the raise's advice: restart from a snapshot at/after the repair.
    # skipChangeCommits + startingVersion at the FSCK version resumes
    # the stream over post-repair appends only.
    repair_v = t.latest_version()
    t.append(spark.createDataFrame([(3,)], "id int"))
    rows = _drain(
        spark, root, "fsck_skip_sink", 1,
        extra_opts={
            "skipChangeCommits": "true",
            "startingVersion": str(repair_v),
        },
    )
    assert {r["id"] for r in rows} == {3}


def test_read_table_stream_helper(registered, tmp_path):
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        read_table_stream,
    )

    spark = registered
    root = str(tmp_path / "tats")
    t = ParquetTable.create(
        spark, root, spark.createDataFrame([(1, "a")], "id int, cat string")
    )
    t.append(spark.createDataFrame([(2, "b")], "id int, cat string"))
    df = read_table_stream(spark, root)
    assert set(df.columns) == {"id", "cat"}  # CDC meta projected away
    q = (
        df.writeStream.format("memory")
        .queryName("tats_sink")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("tats_sink").count() >= 2:
                break
            time.sleep(0.5)
        assert {r.id for r in spark.table("tats_sink").collect()} == {1, 2}
    finally:
        q.stop()


def test_plain_table_stream_raises_on_delete(registered, tmp_path):
    """A sidecar-backed DELETE must FAIL a plain table stream (round-7
    ADVICE): without _change_type downstream, the sidecar's deleted rows
    would be delivered as fresh appends.  skip_change_commits=True opts
    into skipping the commit wholesale, Delta-style."""
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        read_table_stream,
    )

    spark = registered
    root = str(tmp_path / "plaindel")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")]))
    t.delete("k = 1")  # v1: writes a CDC sidecar
    t.append(_rows(spark, [(3, "c", "z")]))  # v2

    q = (
        read_table_stream(spark, root)
        .writeStream.format("memory")
        .queryName("plaindel_fail")
        .outputMode("append")
        .start()
    )
    with pytest.raises(Exception, match="removes or rewrites rows"):
        q.awaitTermination(60)

    # skip_change_commits: v1 skipped entirely; k=1's deletion is NOT
    # reflected (the documented trade-off), k=2 and k=3 arrive as appends
    got = (
        read_table_stream(spark, root, skip_change_commits=True)
        .writeStream.format("memory")
        .queryName("plaindel_skip")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("plaindel_skip").count() >= 3:
                break
            time.sleep(0.5)
        ks = sorted(r["k"] for r in spark.table("plaindel_skip").collect())
        assert ks == [1, 2, 3]  # v0 appends + v2 append; no sidecar rows
    finally:
        got.stop()


def test_plain_table_stream_raises_on_update(registered, tmp_path):
    """UPDATE commits (sidecar with update_pre/postimage rows) likewise
    fail a plain stream — a preimage delivered as an append would
    double-count the row downstream."""
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        read_table_stream,
    )

    spark = registered
    root = str(tmp_path / "plainupd")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x")]))
    t.update(F.col("k") == 1, {"v": F.lit("x2")})  # v1: sidecar, pre+post

    q = (
        read_table_stream(spark, root)
        .writeStream.format("memory")
        .queryName("plainupd_fail")
        .outputMode("append")
        .start()
    )
    with pytest.raises(Exception, match="removes or rewrites rows"):
        q.awaitTermination(60)


def test_overwrite_streams_with_cdf_overwrite_property(registered, tmp_path):
    """Opt-in Delta enableChangeDataFeed behavior for snapshot
    replacement: with table property cdf_overwrite, an OVERWRITE commit
    records delete(old snapshot) + insert(new snapshot) as its sidecar
    and the CDF stream consumes it instead of refusing; without the
    property the refusal (test_sidecarless_rewrite...) stands."""
    spark = registered
    root = str(tmp_path / "tblov")
    t = ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")])
    )
    t.set_properties({"cdf_overwrite": True})  # v1 (metadata)
    t.overwrite(_rows(spark, [(3, "c", "z")]))  # v2: sidecar-backed
    got = _drain(spark, root, "cdf_sink_ov", want_rows=5)
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["k"]) for r in got
    )
    assert changes == [
        (0, "insert", 1),
        (0, "insert", 2),
        (2, "delete", 1),
        (2, "delete", 2),
        (2, "insert", 3),
    ]
    # batch CDF agrees
    ch = t.changes_between(1)
    assert sorted(
        (r["_commit_version"], r["_change_type"], r["k"]) for r in ch.collect()
    ) == [(2, "delete", 1), (2, "delete", 2), (2, "insert", 3)]


def test_cdf_overwrite_property_via_sql_strings(registered, tmp_path):
    """The SQL path stores TBLPROPERTIES values as STRINGS; 'true'
    enables the overwrite sidecar and — crucially — 'false' does not
    read as enabled."""
    from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

    spark = registered
    root = str(tmp_path / "tblovs")
    t = ParquetTable.create(spark, root, _rows(spark, [(1, "a", "x")]))
    lh = Lakehouse(spark)
    lh.register("ovt", root)
    lh.sql("ALTER TABLE ovt SET TBLPROPERTIES ('cdf_overwrite' = 'false')")
    t.overwrite(_rows(spark, [(2, "b", "y")]))
    assert t._manifest()["cdc_files"] == []  # string 'false' stays off
    lh.sql("ALTER TABLE ovt SET TBLPROPERTIES ('cdf_overwrite' = 'true')")
    t.overwrite(_rows(spark, [(3, "c", "z")]))
    assert t._manifest()["cdc_files"], "string 'true' enables the sidecar"


def test_evolving_merge_streams_new_column(registered, tmp_path):
    """A MERGE WITH SCHEMA EVOLUTION commit streams its CDC sidecar
    with the WIDENED schema: post-images and inserts carry the new
    column's values, pre-images NULL-fill it (those rows predate the
    column) — a CDF consumer learns the evolution from the feed."""
    spark = registered
    root = str(tmp_path / "tbl_evo")
    t = ParquetTable.create(
        spark, root, _rows(spark, [(1, "a", "x"), (2, "b", "y")])
    )
    wide = spark.createDataFrame(
        [(1, "a", "x2", 42), (3, "c", "z", 7)],
        "k int, part string, v string, extra int",
    )
    t.merge(wide, on=["k"], evolve_schema=True)  # v1
    got = _drain(spark, root, "cdf_sink_evo", want_rows=5)
    assert "extra" in got[0].asDict()
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["extra"])
        for r in got
    )
    assert changes == [
        (0, "insert", 1, None),
        (0, "insert", 2, None),
        (1, "insert", 3, 7),
        (1, "update_postimage", 1, 42),
        (1, "update_preimage", 1, None),
    ]


def test_variant_column_streams(registered, tmp_path):
    """Round 11: TOP-LEVEL variant columns stream — the q22 fixture
    shape (events.props parsed into VARIANT) written as a lakehouse
    table, DML'd, and consumed through the streaming CDF.  The
    executor read routes through parquet_compat (pyarrow rejects the
    VARIANT footer annotation) and rebuilds VariantVal from the
    engine's unshredded {value, metadata} pair."""
    import os as _os

    from tests.conftest import SF_DIR

    spark = registered
    root = str(tmp_path / "vtbl")
    events = spark.read.parquet(
        _os.path.join(SF_DIR, "events.parquet")
    ).selectExpr("CAST(event_id AS INT) AS k", "props").limit(6)
    base = events.selectExpr("k", "parse_json(props) AS props")
    split = events.selectExpr("k").limit(2)
    first = base.join(split, "k", "left_semi")
    rest = base.join(split, "k", "left_anti")
    t = ParquetTable.create(spark, root, first)
    t.append(rest)  # v1
    t.update("k = k", {"props": F.expr("parse_json('{\"patched\": true}')")})  # v2 sidecar
    n = base.count()
    # n inserts (v0+v1) + n pre-images + n post-images (v2)
    got = _drain(spark, root, "cdf_variant_sink", want_rows=3 * n)
    assert len(got) == 3 * n
    js = {(r["k"], r["_change_type"], str(r["props"])) for r in got}
    # every post-image carries the patched payload
    posts = {x for x in js if x[1] == "update_postimage"}
    assert len(posts) == n
    assert all('"patched":true' in x[2] for x in posts)
    # the batch CDF agrees row-for-row (its contract maps update
    # images to delete/insert)
    mapped = {
        (k, {"update_preimage": "delete", "update_postimage": "insert"}.get(ct, ct), j)
        for (k, ct, j) in js
    }
    want = {
        (r["k"], r["_change_type"], str(r["j"]))
        for r in t.changes_between(1, 2)
        .selectExpr("k", "_change_type", "to_json(props) AS j")
        .collect()
    }
    stream_json = {
        (k, ct, x)
        for (k, ct, x) in mapped
    }
    assert want <= stream_json


def test_nested_variant_streams(registered, tmp_path):
    """Round 12 (verdict #6): variant NESTED in struct/array/map
    streams — the footer patcher walks the flat SchemaElement list, so
    nested VARIANT annotations strip like top-level ones, and the
    type-driven recursive rebuild turns every {value, metadata} pair
    back into a VariantVal at its declared position."""
    spark = registered
    root = str(tmp_path / "nvtbl")
    # both rows in the CREATE frame so the declared schema is nullable
    # at every level (NULL map, NULL variant leaf, NULL array element)
    df = spark.sql(
        "SELECT 1 AS k, "
        "CAST(array(parse_json('{\"a\":1}')) AS ARRAY<VARIANT>) AS vs, "
        "CAST(named_struct('tag', 'x', 'v', parse_json('{\"b\":2}')) "
        "AS STRUCT<tag: STRING, v: VARIANT>) AS sv, "
        "CAST(map('m1', parse_json('[3,4]')) AS MAP<STRING, VARIANT>) AS mv"
        " UNION ALL SELECT 2 AS k, "
        "CAST(array(parse_json('5'), NULL) AS ARRAY<VARIANT>) AS vs, "
        "CAST(named_struct('tag', 'y', 'v', CAST(NULL AS VARIANT)) "
        "AS STRUCT<tag: STRING, v: VARIANT>) AS sv, "
        "CAST(NULL AS MAP<STRING, VARIANT>) AS mv"
    )
    t = ParquetTable.create(spark, root, df)
    t.append(
        spark.sql(
            "SELECT 3 AS k, "
            "CAST(array(parse_json('true')) AS ARRAY<VARIANT>) AS vs, "
            "CAST(named_struct('tag', 'z', 'v', parse_json('7')) "
            "AS STRUCT<tag: STRING, v: VARIANT>) AS sv, "
            "CAST(map('m2', parse_json('\"s\"')) AS MAP<STRING, VARIANT>)"
            " AS mv"
        )
    )
    got = _drain(spark, root, "cdf_nested_variant_sink", want_rows=3)
    by_k = {r["k"]: r for r in got}
    assert set(by_k) == {1, 2, 3}
    r1 = by_k[1]
    assert [str(v) for v in r1["vs"]] == ['{"a":1}']
    assert r1["sv"]["tag"] == "x" and '"b":2' in str(r1["sv"]["v"])
    assert str(r1["mv"]["m1"]) == "[3,4]"
    r2 = by_k[2]
    assert str(r2["vs"][0]) == "5" and r2["vs"][1] is None
    assert r2["sv"]["tag"] == "y" and r2["sv"]["v"] is None
    assert r2["mv"] is None
    r3 = by_k[3]
    assert str(r3["vs"][0]) == "true"
    assert str(r3["sv"]["v"]) == "7"
    assert str(r3["mv"]["m2"]) == '"s"'
    assert r3["_change_type"] == "insert" and r3["_commit_version"] == 1
