"""APPLY CHANGES INTO (`streaming/apply_changes`): declarative CDC apply
with sequence-based out-of-order protection, SCD1 and SCD2 targets —
the engine primitive behind DLT's statement of the same name
(``bronze_silver_gold/readme.md:42-70`` documents the MERGE-based CDC
pattern this generalizes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.scd import (
    as_of_view,
    current_view,
)
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable
from azure_databricks_lakehouse_spark.streaming.apply_changes import (
    APPLY_SEQ,
    apply_changes,
    apply_changes_batch,
)



def _events(spark, rows):
    # rows: (id, name, amt, ts_str, op)
    return spark.createDataFrame(
        rows, "id int, name string, amt double, ts string, op string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _state(spark, root):
    return {
        r.id: (r.name, r.amt)
        for r in ParquetTable.for_path(spark, root).read().collect()
    }


KW = dict(keys=["id"], sequence_by="ts", apply_as_deletes="op = 'D'")


def test_scd1_create_and_latest_per_key_within_batch(spark, tmp_path):
    root = str(tmp_path / "t1")
    res = apply_changes_batch(
        spark,
        root,
        _events(
            spark,
            [
                (1, "a0", 1.0, "2024-01-01 00:00:00", "U"),
                (1, "a1", 2.0, "2024-01-01 00:05:00", "U"),  # later wins
                (2, "b0", 5.0, "2024-01-01 00:01:00", "U"),
            ],
        ),
        **KW,
    )
    assert res == {"upserted": 2, "deleted": 0, "skipped_late": 0}
    assert _state(spark, root) == {1: ("a1", 2.0), 2: ("b0", 5.0)}
    # the applied sequence rides the row for the next batch's floor
    seqs = {
        r.id: str(r[APPLY_SEQ])
        for r in ParquetTable.for_path(spark, root).read().collect()
    }
    assert seqs[1] == "2024-01-01 00:05:00"


def test_scd1_out_of_order_and_replay(spark, tmp_path):
    root = str(tmp_path / "t1")
    b1 = _events(spark, [(1, "new", 9.0, "2024-01-02 00:00:00", "U")])
    apply_changes_batch(spark, root, b1, **KW)
    # a LATE event (older ts) in a later batch must not clobber
    late = _events(spark, [(1, "stale", 0.0, "2024-01-01 00:00:00", "U")])
    res = apply_changes_batch(spark, root, late, **KW)
    assert res == {"upserted": 0, "deleted": 0, "skipped_late": 1}
    assert _state(spark, root) == {1: ("new", 9.0)}
    # replaying an applied batch is a no-op (equal sequence skipped)
    res = apply_changes_batch(spark, root, b1, **KW)
    assert res["upserted"] == 0 and res["skipped_late"] == 1
    assert _state(spark, root) == {1: ("new", 9.0)}


def test_scd1_deletes_and_tie_resolution(spark, tmp_path):
    root = str(tmp_path / "t1")
    apply_changes_batch(
        spark,
        root,
        _events(
            spark,
            [
                (1, "a", 1.0, "2024-01-01 00:00:00", "U"),
                (2, "b", 2.0, "2024-01-01 00:00:00", "U"),
            ],
        ),
        **KW,
    )
    # delete beats an OLDER update in the same batch; exact-tie -> delete
    res = apply_changes_batch(
        spark,
        root,
        _events(
            spark,
            [
                (1, "upd", 9.0, "2024-01-02 00:00:00", "U"),
                (1, None, None, "2024-01-02 00:10:00", "D"),
                (2, "tie", 7.0, "2024-01-02 00:00:00", "U"),
                (2, None, None, "2024-01-02 00:00:00", "D"),
                (3, None, None, "2024-01-02 00:00:00", "D"),  # unmatched
            ],
        ),
        **KW,
    )
    assert res == {"upserted": 0, "deleted": 3, "skipped_late": 0}
    assert _state(spark, root) == {}


def test_scd1_validation_and_except_columns(spark, tmp_path):
    root = str(tmp_path / "t1")
    with pytest.raises(ValueError, match="missing required columns"):
        apply_changes_batch(
            spark,
            root,
            spark.createDataFrame([(1,)], "id int"),
            keys=["id"],
            sequence_by="ts",
        )
    apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "a", 1.0, "2024-01-01 00:00:00", "U")]),
        **KW,
        except_columns=["op"],
    )
    cols = ParquetTable.for_path(spark, root).read().columns
    assert "op" not in cols and APPLY_SEQ in cols


def test_scd2_versions_within_and_across_batches(spark, tmp_path):
    root = str(tmp_path / "t2")
    res = apply_changes_batch(
        spark,
        root,
        _events(
            spark,
            [
                # two changes of one key in ONE batch -> chained versions
                (1, "v1", 1.0, "2024-01-01 00:00:00", "U"),
                (1, "v2", 2.0, "2024-02-01 00:00:00", "U"),
                (2, "x", 5.0, "2024-01-15 00:00:00", "U"),
            ],
        ),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 3, "closed": 0}
    cur = {r.id: r.name for r in current_view(spark, root).collect()}
    assert cur == {1: "v2", 2: "x"}
    jan = {r.id: r.name for r in as_of_view(spark, root, "2024-01-20 00:00:00").collect()}
    assert jan == {1: "v1", 2: "x"}

    # cross-batch change closes the stored current version
    res = apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "v3", 3.0, "2024-03-01 00:00:00", "U")]),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 1, "closed": 1}
    hist = (
        ParquetTable.for_path(spark, root)
        .read()
        .filter("id = 1")
        .orderBy("effective_from")
        .collect()
    )
    assert [r.name for r in hist] == ["v1", "v2", "v3"]
    assert [r.is_current for r in hist] == [False, False, True]
    assert str(hist[1].effective_to) == "2024-03-01 00:00:00"


def test_scd2_no_change_suppression_and_replay(spark, tmp_path):
    root = str(tmp_path / "t2")
    b1 = _events(spark, [(1, "a", 1.0, "2024-01-01 00:00:00", "U")])
    apply_changes_batch(spark, root, b1, scd_type=2, **KW)
    # identical payload at a later ts -> no new version
    res = apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "a", 1.0, "2024-06-01 00:00:00", "U")]),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 0, "closed": 0}
    # replay of batch 1 -> floor refuses (equal sequence)
    res = apply_changes_batch(spark, root, b1, scd_type=2, **KW)
    assert res == {"versioned": 0, "closed": 0}
    assert ParquetTable.for_path(spark, root).read().count() == 1


def test_scd2_delete_closes_and_fences_late_events(spark, tmp_path):
    root = str(tmp_path / "t2")
    apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "a", 1.0, "2024-01-01 00:00:00", "U")]),
        scd_type=2,
        **KW,
    )
    res = apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, None, None, "2024-02-01 00:00:00", "D")]),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 0, "closed": 1}
    assert current_view(spark, root).count() == 0
    closed = ParquetTable.for_path(spark, root).read().collect()[0]
    assert str(closed.effective_to) == "2024-02-01 00:00:00"
    # a late event BEFORE the delete is fenced by the close time...
    res = apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "late", 9.0, "2024-01-15 00:00:00", "U")]),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 0, "closed": 0}
    assert current_view(spark, root).count() == 0
    # ...but a genuinely newer event re-opens the key
    res = apply_changes_batch(
        spark,
        root,
        _events(spark, [(1, "back", 2.0, "2024-03-01 00:00:00", "U")]),
        scd_type=2,
        **KW,
    )
    assert res == {"versioned": 1, "closed": 0}
    cur = current_view(spark, root).collect()
    assert len(cur) == 1 and cur[0].name == "back"
    # reinsert after delete opens a version even with pre-delete values
    assert ParquetTable.for_path(spark, root).read().count() == 2


def test_scd2_in_batch_delete_then_reinsert(spark, tmp_path):
    root = str(tmp_path / "t2")
    apply_changes_batch(
        spark,
        root,
        _events(
            spark,
            [
                (1, "a", 1.0, "2024-01-01 00:00:00", "U"),
                (1, None, None, "2024-02-01 00:00:00", "D"),
                (1, "a", 1.0, "2024-03-01 00:00:00", "U"),
            ],
        ),
        scd_type=2,
        **KW,
    )
    hist = (
        ParquetTable.for_path(spark, root)
        .read()
        .orderBy("effective_from")
        .collect()
    )
    # delete closes the first interval; identical values re-open after
    assert [(r.name, r.is_current) for r in hist] == [
        ("a", False),
        ("a", True),
    ]
    assert str(hist[0].effective_to) == "2024-02-01 00:00:00"
    assert str(hist[1].effective_from) == "2024-03-01 00:00:00"


def test_streaming_apply_changes_scd1(spark, tmp_path):
    """End-to-end over a real stream: CDC events land as parquet files,
    apply_changes drains them with availableNow; a second run with new
    files advances from the checkpoint and respects the floor."""
    root = str(tmp_path / "target")
    src_dir = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "ckpt")
    schema = "id int, name string, amt double, ts timestamp, op string"

    _events(
        spark,
        [
            (1, "a", 1.0, "2024-01-01 00:00:00", "U"),
            (2, "b", 2.0, "2024-01-01 00:00:00", "U"),
        ],
    ).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    apply_changes(
        spark, root, stream, checkpoint=ckpt, **KW
    ).awaitTermination(120)
    assert _state(spark, root) == {1: ("a", 1.0), 2: ("b", 2.0)}

    _events(
        spark,
        [
            (1, None, None, "2024-01-02 00:00:00", "D"),
            (2, "late", 0.0, "2023-12-31 00:00:00", "U"),  # fenced
            (3, "c", 3.0, "2024-01-02 00:00:00", "U"),
        ],
    ).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    apply_changes(
        spark, root, stream, checkpoint=ckpt, **KW
    ).awaitTermination(120)
    assert _state(spark, root) == {2: ("b", 2.0), 3: ("c", 3.0)}

    with pytest.raises(ValueError, match="batch DataFrame"):
        apply_changes(
            spark,
            root,
            _events(spark, []),
            checkpoint=ckpt,
            **KW,
        )


def test_streaming_apply_changes_from_cdf_matches_batch_scd2(spark, tmp_path):
    """Round-8 verdict item 7 — the DLT pattern end-to-end: a silver-style
    MERGE-maintained table's CHANGE FEED (`sources/cdf_stream`) streams
    through apply_changes into an SCD2 dim, and the resulting history is
    row-identical to batch `operators/scd.apply_scd2` on the same input.

    The CDF's update pairs need no special handling: the delete-half of
    a rewrite diff carries the PRE-image's `updated_at`, which the
    sequence floor fences, while the insert-half drives the new version
    — `SEQUENCE BY updated_at` alone reconstructs the SCD2 history.
    """
    from azure_databricks_lakehouse_spark.operators.scd import apply_scd2
    from azure_databricks_lakehouse_spark.sources.cdf_stream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    t1, t2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

    def _members(rows):
        return spark.createDataFrame(
            rows, "member_id int, name string, tier string, updated_at string"
        ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))

    src_root = str(tmp_path / "members")
    src = ParquetTable.create(
        spark, src_root, _members([(1, "ann", "gold", t1), (2, "bob", "silver", t1)])
    )

    stream_dim = str(tmp_path / "dim_stream")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(
        keys=["member_id"],
        sequence_by="updated_at",
        apply_as_deletes="_change_type = 'delete'",
        except_columns=(
            "_change_type", "_commit_version", "_commit_timestamp",
        ),
        scd_type=2,
    )

    def _drain():
        feed = (
            spark.readStream.format("table_changes")
            .option("path", src_root)
            .load()
        )
        apply_changes(
            spark, stream_dim, feed, checkpoint=ckpt, **kw
        ).awaitTermination(120)

    _drain()  # commit 0: the initial snapshot as inserts

    # commit 1: attribute change for member 1, new member 3 — the
    # MERGE-maintained silver pattern (rewrite diff = delete+insert pair)
    src.merge(
        _members([(1, "ann", "plat", t2), (3, "cy", "bronze", t2)]),
        on=["member_id"],
    )
    _drain()

    # batch twin: operators/scd.apply_scd2 on the same two update batches
    batch_dim = str(tmp_path / "dim_batch")
    apply_scd2(
        spark,
        batch_dim,
        _members([(1, "ann", "gold", t1), (2, "bob", "silver", t1)]).drop(
            "updated_at"
        ),
        "member_id",
        ["name", "tier"],
        as_of=t1,
    )
    apply_scd2(
        spark,
        batch_dim,
        _members(
            [(1, "ann", "plat", t2), (2, "bob", "silver", t2), (3, "cy", "bronze", t2)]
        ).drop("updated_at"),
        "member_id",
        ["name", "tier"],
        as_of=t2,
    )

    sdf = ParquetTable.for_path(spark, stream_dim).read()
    bdf = ParquetTable.for_path(spark, batch_dim).read()
    assert sorted(sdf.columns) == sorted(bdf.columns)
    cols = sorted(sdf.columns)
    key = lambda r: (r["member_id"], str(r["effective_from"]))
    assert sorted(sdf.select(*cols).collect(), key=key) == sorted(
        bdf.select(*cols).collect(), key=key
    )
    # shape spot-check: member 1 has closed v1 + open v2; 2 and 3 open
    hist = {
        (r.member_id, r.tier): (str(r.effective_from), r.is_current)
        for r in sdf.collect()
    }
    assert hist == {
        (1, "gold"): (t1, False),
        (1, "plat"): (t2, True),
        (2, "silver"): (t1, True),
        (3, "bronze"): (t2, True),
    }


def test_streaming_apply_changes_cdf_deletes_via_commit_timestamp(spark, tmp_path):
    """True deletes from a change feed: a DELETE's CDF row carries the
    PRE-image's business timestamp, which the sequence floor would
    fence — sequencing by the CDF's _commit_timestamp (round-8 column)
    instead gives every event the commit's own instant, so the delete
    closes the SCD2 version.  This is exactly Databricks' documented
    APPLY CHANGES + readChangeFeed pattern (SEQUENCE BY
    _commit_timestamp)."""
    from azure_databricks_lakehouse_spark.sources.cdf_stream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    src_root = str(tmp_path / "members")
    src = ParquetTable.create(
        spark,
        src_root,
        spark.createDataFrame(
            [(1, "ann", "gold"), (2, "bob", "silver")],
            "member_id int, name string, tier string",
        ),
    )
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ck")
    kw = dict(
        keys=["member_id"],
        sequence_by="_commit_timestamp",
        apply_as_deletes="_change_type = 'delete'",
        except_columns=("_change_type", "_commit_version"),
        scd_type=2,
    )

    def _drain():
        feed = (
            spark.readStream.format("table_changes")
            .option("path", src_root)
            .load()
        )
        apply_changes(spark, dim, feed, checkpoint=ckpt, **kw).awaitTermination(120)

    _drain()  # v0 snapshot
    src.delete("member_id = 2")  # v1: sidecar delete row
    _drain()

    hist = {
        r.member_id: (r.name, r.is_current, r.effective_to is not None)
        for r in ParquetTable.for_path(spark, dim).read().collect()
    }
    # member 2's only version is CLOSED by the delete; member 1 open
    assert hist[1] == ("ann", True, False)
    assert hist[2] == ("bob", False, True)


def test_apply_changes_schema_evolution(spark, tmp_path):
    """A CDC feed that gained a column evolves the target only under
    evolve_schema=True (both SCD types); stored rows and SCD2's closed
    versions NULL-fill the new column; without the flag the wider feed
    raises loudly."""
    root1 = str(tmp_path / "evo1")
    apply_changes_batch(
        spark, root1,
        _events(spark, [(1, "a", 1.0, "2024-01-01", "U"),
                        (2, "b", 2.0, "2024-01-01", "U")]),
        **KW,
    )
    wide = spark.createDataFrame(
        [(1, "a2", 10.0, "2024-01-02", "U", "west")],
        "id int, name string, amt double, ts string, op string, region string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # the SCD1 error names THIS surface's SQL escape hatch (APPLY
    # CHANGES ... WITH SCHEMA EVOLUTION), not merge()'s MERGE form
    with pytest.raises(ValueError, match="APPLY CHANGES"):
        apply_changes_batch(spark, root1, wide, **KW)
    apply_changes_batch(spark, root1, wide, evolve_schema=True, **KW)
    rows = {
        r.id: (r.name, r.region)
        for r in ParquetTable.for_path(spark, root1).read().collect()
    }
    assert rows == {1: ("a2", "west"), 2: ("b", None)}

    # SCD2: the closed old version NULL-fills, the new version carries it
    root2 = str(tmp_path / "evo2")
    apply_changes_batch(
        spark, root2,
        _events(spark, [(1, "a", 1.0, "2024-01-01", "U")]),
        scd_type=2, **KW,
    )
    apply_changes_batch(spark, root2, wide, scd_type=2, evolve_schema=True, **KW)
    hist = sorted(
        (bool(r.is_current), r.name, r.region)
        for r in ParquetTable.for_path(spark, root2).read().collect()
    )
    assert hist == [(False, "a", None), (True, "a2", "west")]


def test_sql_apply_changes_with_schema_evolution(spark, tmp_path):
    from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    _events(spark, [(1, "a", 1.0, "2024-01-01", "U")]).createOrReplaceTempView(
        "feed0"
    )
    lh.sql(
        "APPLY CHANGES INTO tgt FROM feed0 KEYS (id) "
        "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts"
    )
    spark.createDataFrame(
        [(1, "a2", 5.0, "2024-01-02", "U", "east")],
        "id int, name string, amt double, ts string, op string, region string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).createOrReplaceTempView(
        "feed1"
    )
    with pytest.raises(ValueError, match="SCHEMA EVOLUTION"):
        lh.sql(
            "APPLY CHANGES INTO tgt FROM feed1 KEYS (id) "
            "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts"
        )
    lh.sql(
        "APPLY CHANGES INTO tgt FROM feed1 KEYS (id) "
        "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts "
        "WITH SCHEMA EVOLUTION"
    )
    row = lh.sql("SELECT name, region FROM tgt").collect()[0]
    assert (row["name"], row["region"]) == ("a2", "east")
