"""SQL front-end (`sources/sql.Lakehouse`): Delta-flavored statements
routed to the table layer.

The reference drives its lakehouse with SQL strings
(`bronze/bronze_rx_claims_load.py:77`, `gold/gold_rx_claims_load.py:79-232`,
`bronze_silver_gold/readme.md:96-109`); these tests assert that a user can
paste those statement shapes here unchanged and hit the same versioned
table machinery the Python API exercises.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _mk(spark, tmp_path, rows, name="t", lh=None, partition_by=None):
    df = spark.createDataFrame(rows, "id int, cat string, amt double")
    root = str(tmp_path / f"tbl_{name}")
    t = ParquetTable.create(spark, root, df, partition_by=partition_by)
    if lh is not None:
        lh.register(name, root)
    return t


def test_reference_registration_form_and_select(spark, tmp_path, lh):
    # the reference's exact CREATE shape: register an existing location
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    lh.sql(
        f"CREATE TABLE IF NOT EXISTS bronze.rx_claims USING DELTA "
        f"LOCATION '{t.root}'"
    )
    got = lh.sql(
        "SELECT id, amt FROM bronze.rx_claims WHERE cat = 'a' -- comment\n"
    ).collect()
    assert [(r.id, r.amt) for r in got] == [(1, 1.0)]
    # IF NOT EXISTS is a no-op the second time (reference re-runs cells)
    lh.sql(
        f"CREATE TABLE IF NOT EXISTS bronze.rx_claims USING DELTA "
        f"LOCATION '{t.root}'"
    )


def test_ctas_insert_and_time_travel(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], name="src", lh=lh)
    lh.sql("CREATE TABLE derived USING DELTA AS SELECT id, amt * 2 AS amt2 FROM src")
    assert {r.amt2 for r in lh.sql("SELECT * FROM derived").collect()} == {2.0, 4.0}
    lh.sql("INSERT INTO derived VALUES (3, 6.0)")
    assert lh.sql("SELECT count(*) AS n FROM derived").collect()[0].n == 3
    # v0 still has 2 rows
    assert (
        lh.sql("SELECT count(*) AS n FROM derived VERSION AS OF 0").collect()[0].n
        == 2
    )
    lh.sql("INSERT OVERWRITE derived SELECT id, amt FROM src WHERE id = 1")
    assert lh.sql("SELECT count(*) AS n FROM derived").collect()[0].n == 1


def test_delete_update_report_counts_and_prune(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(i, "a" if i % 2 else "b", float(i)) for i in range(10)], lh=lh)
    r = lh.sql("DELETE FROM t WHERE id >= 8").collect()[0]
    assert r.num_affected_rows == 2
    r = lh.sql("UPDATE t SET amt = amt + 100, cat = upper(cat) WHERE id = 0").collect()[0]
    assert r.num_affected_rows == 1
    row = lh.sql("SELECT cat, amt FROM t WHERE id = 0").collect()[0]
    assert (row.cat, row.amt) == ("B", 100.0)
    # SQL UPDATE semantics: RHS reads the PRE-update row
    lh.sql("UPDATE t SET amt = CAST(id AS DOUBLE), id = CAST(amt AS INT) WHERE id = 1")
    swapped = lh.sql("SELECT id, amt FROM t WHERE amt = 1.0").collect()[0]
    assert (swapped.id, swapped.amt) == (1, 1.0)


def test_merge_reference_shape(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    src = spark.createDataFrame(
        [(2, "b2", 20.0), (3, "c", 3.0)], "id int, cat string, amt double"
    )
    src.createOrReplaceTempView("updates")
    lh.sql(
        "MERGE INTO t AS tgt USING updates AS s ON tgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a", 1.0), (2, "b2", 20.0), (3, "c", 3.0)}
    # idempotent: run again, byte-identical result (readme.md:68-70)
    lh.sql(
        "MERGE INTO t AS tgt USING updates AS s ON tgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()} == got


def test_merge_one_sided_and_delete_clause(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    src = spark.createDataFrame(
        [(2, "b9", 9.0), (7, "g", 7.0)], "id int, cat string, amt double"
    )
    src.createOrReplaceTempView("u1")
    # update-only: row 7 must NOT be inserted
    lh.sql(
        "MERGE INTO t USING u1 AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    assert {r.id for r in lh.sql("SELECT id FROM t").collect()} == {1, 2}
    assert lh.sql("SELECT amt FROM t WHERE id = 2").collect()[0].amt == 9.0
    # insert-only: row 2 must NOT be touched
    src2 = spark.createDataFrame(
        [(2, "zz", 0.0), (5, "e", 5.0)], "id int, cat string, amt double"
    )
    src2.createOrReplaceTempView("u2")
    lh.sql("MERGE INTO t USING u2 AS s ON t.id = s.id WHEN NOT MATCHED THEN INSERT *")
    assert lh.sql("SELECT amt FROM t WHERE id = 2").collect()[0].amt == 9.0
    assert {r.id for r in lh.sql("SELECT id FROM t").collect()} == {1, 2, 5}
    # CDC shape: delete clause driven by a source flag column
    cdc = spark.createDataFrame(
        [(5, "e", 5.0, "D"), (6, "f", 6.0, "I")],
        "id int, cat string, amt double, op string",
    )
    cdc.createOrReplaceTempView("cdc")
    lh.sql(
        "MERGE INTO t USING (SELECT * FROM cdc) AS s ON t.id = s.id "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    ids = {r.id for r in lh.sql("SELECT id FROM t").collect()}
    assert ids == {1, 2, 6}
    # the op meta column must not have schema-evolved into the table
    assert "op" not in lh.table("t").read().columns


def test_merge_delete_plus_insert_only(spark, tmp_path, lh):
    """Round-7 ADVICE (high): DELETE + INSERT * with no UPDATE SET *
    must still fire the deletes — the insert-only anti-join used to
    strip the delete-flagged matched rows before merge() saw them."""
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], lh=lh)
    cdc = spark.createDataFrame(
        [
            (2, "b", 2.0, "D"),   # matched + flagged  -> DELETE
            (3, "c9", 99.0, "I"),  # matched, unflagged -> no-op (no UPDATE)
            (9, "i", 9.0, "I"),   # unmatched          -> INSERT
            (8, "h", 8.0, "D"),   # unmatched delete   -> no-op (CDC contract)
        ],
        "id int, cat string, amt double, op string",
    )
    cdc.createOrReplaceTempView("cdc2")
    lh.sql(
        "MERGE INTO t USING cdc2 AS s ON t.id = s.id "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a", 1.0), (3, "c", 3.0), (9, "i", 9.0)}


def test_merge_rejects_unsupported_clauses(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    spark.createDataFrame([(1, "x", 9.0)], "id int, cat string, amt double")\
        .createOrReplaceTempView("s0")
    with pytest.raises(ValueError, match="updateAll/insertAll"):
        lh.sql(
            "MERGE INTO t USING s0 AS s ON t.id = s.id "
            "WHEN MATCHED THEN FROBNICATE"
        )
    with pytest.raises(ValueError, match="NOT MATCHED"):
        lh.sql(
            "MERGE INTO t USING s0 AS s ON t.id = s.id "
            "WHEN MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="equi-key"):
        lh.sql(
            "MERGE INTO t USING s0 AS s ON t.id > s.id "
            "WHEN MATCHED THEN UPDATE SET *"
        )


def test_merge_per_column_update_set(spark, tmp_path, lh):
    """Round-7 verdict item 2: per-column UPDATE SET with expression
    RHSs referencing BOTH aliases and pre-image semantics — unnamed
    columns keep their pre-image values."""
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], lh=lh)
    spark.createDataFrame(
        [(1, "zz", 10.0), (2, "yy", 20.0), (9, "ii", 90.0)],
        "id int, cat string, amt double",
    ).createOrReplaceTempView("updsrc")
    lh.sql(
        "MERGE INTO t USING updsrc AS s ON t.id = s.id "
        "WHEN MATCHED AND s.amt > 15 THEN UPDATE SET amt = s.amt + t.amt "
        "WHEN NOT MATCHED THEN INSERT (id, cat, amt) "
        "VALUES (s.id, upper(s.cat), s.amt / 2)"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {
        (1, "a", 1.0),     # matched, pred false -> untouched pre-image
        (2, "b", 22.0),    # matched, pred true -> amt updated, cat kept
        (3, "c", 3.0),     # unmatched target -> kept
        (9, "II", 45.0),   # unmatched source -> expression INSERT
    }


def test_merge_clause_order_and_case_when_rhs(spark, tmp_path, lh):
    """Ordered-cascade semantics: the FIRST matched clause whose
    predicate holds wins (Delta's evaluation order), and a CASE WHEN
    inside a SET RHS must not confuse the clause splitter."""
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], lh=lh)
    spark.createDataFrame(
        [(1, "del", 0.0), (2, "keep", 5.0), (3, "keep", 50.0)],
        "id int, cat string, amt double",
    ).createOrReplaceTempView("ordsrc")
    lh.sql(
        "MERGE INTO t USING ordsrc AS s ON t.id = s.id "
        "WHEN MATCHED AND s.cat = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET "
        "cat = CASE WHEN s.amt > 10 THEN 'big' ELSE 'small' END"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(2, "small", 2.0), (3, "big", 3.0)}
    # id=1 deleted by the first clause even though the second also matches


def test_merge_unconditional_delete_and_default_fill(spark, tmp_path, lh):
    """Unconditional WHEN MATCHED THEN DELETE (ordered path resolves
    the old ambiguity); INSERT with unnamed columns takes the declared
    DEFAULT."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], name="dt")
    t.set_default("cat", "'unknown'")
    lh.register("dt", t.root)
    spark.createDataFrame(
        [(2,), (7,)], "id int"
    ).createOrReplaceTempView("delsrc")
    lh.sql(
        "MERGE INTO dt USING delsrc AS s ON dt.id = s.id "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, 7.5)"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM dt").collect()}
    assert got == {(1, "a", 1.0), (7, "unknown", 7.5)}


def test_merge_not_matched_by_source_delete_syncs(spark, tmp_path, lh):
    """The canonical full-sync statement: target rows absent from the
    source are deleted, matched rows updated, new rows inserted — one
    MERGE replaces the reference's truncate-and-reload pattern."""
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], lh=lh)
    spark.createDataFrame(
        [(2, "b9", 9.0), (4, "d", 4.0)], "id int, cat string, amt double"
    ).createOrReplaceTempView("syncsrc")
    lh.sql(
        "MERGE INTO t USING syncsrc AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(2, "b9", 9.0), (4, "d", 4.0)}


def test_merge_not_matched_by_source_predicated_update(spark, tmp_path, lh):
    """BY SOURCE UPDATE SET marks stale target rows; the predicate and
    the SET expressions see only target columns, and unmatched target
    rows whose predicate is false stay byte-identical (carried over by
    the pruned rewrite, not re-emitted)."""
    _mk(
        spark,
        tmp_path,
        [(1, "live", 1.0), (2, "live", 20.0), (3, "live", 30.0)],
        lh=lh,
    )
    spark.createDataFrame(
        [(1, "x", 0.0)], "id int, cat string, amt double"
    ).createOrReplaceTempView("presrc")
    lh.sql(
        "MERGE INTO t AS tg USING presrc AS s ON tg.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND tg.amt >= 25 "
        "THEN UPDATE SET cat = 'stale', amt = tg.amt * 0"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {
        (1, "live", 1.0),    # matched -> untouched (no MATCHED clause)
        (2, "live", 20.0),   # unmatched, pred false -> untouched
        (3, "stale", 0.0),   # unmatched, pred true -> rewritten
    }


def test_merge_by_source_clause_validation(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    spark.createDataFrame(
        [(1, "x", 9.0)], "id int, cat string, amt double"
    ).createOrReplaceTempView("bs0")
    base = "MERGE INTO t USING bs0 AS s ON t.id = s.id "
    with pytest.raises(ValueError, match="only DELETE or"):
        lh.sql(base + "WHEN NOT MATCHED BY SOURCE THEN INSERT *")
    with pytest.raises(ValueError, match="no source row to expand"):
        lh.sql(base + "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")
    with pytest.raises(ValueError, match="only the target alias"):
        lh.sql(
            base + "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET amt = s.amt"
        )
    with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE"):
        lh.sql(base + "WHEN MATCHED BY SOURCE THEN DELETE")


def test_merge_duplicate_source_match_aborts_sql(spark, tmp_path, lh):
    """Delta's nondeterministic-merge abort surfaces through the SQL
    path too — on both the star fast path and the per-column rewrite."""
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    spark.createDataFrame(
        [(1, "x", 9.0), (1, "y", 8.0)], "id int, cat string, amt double"
    ).createOrReplaceTempView("dupsrc")
    with pytest.raises(ValueError, match="nondeterministic"):
        lh.sql(
            "MERGE INTO t USING dupsrc AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="nondeterministic"):
        lh.sql(
            "MERGE INTO t USING dupsrc AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET amt = s.amt"
        )
    assert lh.sql("SELECT * FROM t").collect()[0].amt == 1.0


def test_merge_insert_only_allows_duplicate_matched_source(spark, tmp_path, lh):
    """Round-8 ADVICE item 1: an insert-only MERGE (no WHEN MATCHED
    clause) must ACCEPT a source whose duplicate keys match one target
    row — Delta only aborts when a matched clause would make the update
    nondeterministic.  Matched duplicates simply don't fire INSERT; the
    target row stays byte-identical.  Both the per-column rewrite and
    the INSERT-* star fast path agree."""
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    spark.createDataFrame(
        [(1, "x", 9.0), (1, "y", 8.0), (5, "n", 5.0)],
        "id int, cat string, amt double",
    ).createOrReplaceTempView("insdup")
    # per-column INSERT (cols) VALUES — previously aborted via
    # validate_source_keys even though no matched clause existed
    lh.sql(
        "MERGE INTO t USING insdup AS s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id, cat, amt) "
        "VALUES (s.id, upper(s.cat), s.amt)"
    )
    got = {(r.id, r.cat, r.amt) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a", 1.0), (5, "N", 5.0)}
    # star fast path stays consistent (second run: 5 now matched too)
    lh.sql(
        "MERGE INTO t USING insdup AS s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert lh.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
    # predicated insert-only: unmatched row gated by its predicate
    spark.createDataFrame(
        [(1, "z", 7.0), (8, "lo", 0.5), (9, "hi", 9.9)],
        "id int, cat string, amt double",
    ).createOrReplaceTempView("insdup2")
    lh.sql(
        "MERGE INTO t USING insdup2 AS s ON t.id = s.id "
        "WHEN NOT MATCHED AND s.amt > 1 THEN INSERT (id, cat, amt) "
        "VALUES (s.id, s.cat, s.amt)"
    )
    got = {(r.id, r.cat) for r in lh.sql("SELECT * FROM t").collect()}
    assert got == {(1, "a"), (5, "N"), (9, "hi")}


def test_optimize_vacuum_history_detail(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    for i in range(2, 6):
        t.append(spark.createDataFrame([(i, "a", float(i))], t.read().schema))
    before = len(t._manifest()["files"])
    lh.sql("OPTIMIZE t")
    assert len(t._manifest()["files"]) < before
    hist = lh.sql("DESCRIBE HISTORY t").collect()
    assert hist[0].operation == "OPTIMIZE" and hist[-1].operation == "CREATE"
    assert lh.sql("DESCRIBE HISTORY t LIMIT 2").count() == 2
    detail = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert detail.num_files == len(t._manifest()["files"])
    assert detail.version == t.latest_version()
    # RETAIN 0 HOURS → only the newest version's files survive
    deleted = lh.sql("VACUUM t RETAIN 0 HOURS").collect()[0].files_deleted
    assert deleted > 0
    with pytest.raises(Exception):
        t.read(version=0).collect()


def test_optimize_zorder_routes_to_clustering(spark, tmp_path, lh):
    rows = [(i, "c" + str(i % 4), float(i)) for i in range(100)]
    t = _mk(spark, tmp_path, rows, lh=lh)
    lh.sql("OPTIMIZE t ZORDER BY (id, amt)")
    clu = t.detail()["properties"]["clustering"]
    assert clu["cols"] == ["id", "amt"]
    # second z-order with SAME columns is incremental: no new files → no-op
    v = t.latest_version()
    lh.sql("OPTIMIZE t ZORDER BY (id, amt)")
    assert t.latest_version() == v


def test_restore_and_table_changes_tvf(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    t.append(spark.createDataFrame([(2, "b", 2.0)], t.read().schema))
    t.append(spark.createDataFrame([(3, "c", 3.0)], t.read().schema))
    cdf = lh.sql(
        "SELECT id, _change_type, _commit_version "
        "FROM table_changes('t', 0, 2) ORDER BY id"
    ).collect()
    assert [(r.id, r._change_type, r._commit_version) for r in cdf] == [
        (2, "insert", 1),
        (3, "insert", 2),
    ]
    lh.sql("RESTORE TABLE t TO VERSION AS OF 1")
    assert {r.id for r in lh.sql("SELECT id FROM t").collect()} == {1, 2}


def test_alter_forms(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    lh.sql("ALTER TABLE t ADD COLUMN note string")
    lh.sql("ALTER TABLE t RENAME COLUMN note TO memo")
    lh.sql("ALTER TABLE t ALTER COLUMN memo SET DEFAULT 'n/a'")
    lh.sql("INSERT INTO t (id, cat, amt) VALUES (2, 'b', 2.0)")
    assert (
        lh.sql("SELECT memo FROM t WHERE id = 2").collect()[0].memo == "n/a"
    )
    lh.sql("ALTER TABLE t ALTER COLUMN id TYPE bigint")
    assert dict(t.read().dtypes)["id"] == "bigint"
    lh.sql("ALTER TABLE t ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    with pytest.raises(Exception, match="amt_pos"):
        lh.sql("INSERT INTO t (id, cat, amt) VALUES (9, 'x', -1.0)")
    lh.sql("ALTER TABLE t DROP CONSTRAINT amt_pos")
    lh.sql("INSERT INTO t (id, cat, amt) VALUES (9, 'x', -1.0)")
    lh.sql("ALTER TABLE t SET TBLPROPERTIES ('owner' = 'etl', 'retries' = 3)")
    props = t.properties()
    assert props["owner"] == "etl" and props["retries"] == 3
    lh.sql("ALTER TABLE t DROP COLUMN memo")
    assert "memo" not in t.read().columns


def test_create_with_schema_identity_generated(spark, tmp_path, lh):
    loc = str(tmp_path / "sch")
    lh.sql(
        "CREATE TABLE ledger ("
        "  entry_id bigint GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),"
        "  amount double NOT NULL,"
        "  cat string DEFAULT 'misc',"
        "  amount_x2 double GENERATED ALWAYS AS (amount * 2)"
        f") USING DELTA LOCATION '{loc}'"
    )
    lh.sql("INSERT INTO ledger (amount) VALUES (1.5), (2.5)")
    rows = lh.sql("SELECT * FROM ledger ORDER BY entry_id").collect()
    assert [r.entry_id for r in rows] == [10, 15]
    assert [r.cat for r in rows] == ["misc", "misc"]
    assert [r.amount_x2 for r in rows] == [3.0, 5.0]
    with pytest.raises(Exception):
        lh.sql("INSERT INTO ledger (amount) VALUES (NULL)")  # NOT NULL


def test_convert_then_register(spark, tmp_path, lh):
    raw = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, cat string")\
        .write.parquet(raw)
    lh.sql(f"CONVERT TO DELTA parquet.`{raw}`")
    lh.sql(f"CREATE TABLE adopted USING DELTA LOCATION '{raw}'")
    assert lh.sql("SELECT count(*) AS n FROM adopted").collect()[0].n == 2


def test_shallow_clone_version_pin(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    t.append(spark.createDataFrame([(2, "b", 2.0)], t.read().schema))
    dest = str(tmp_path / "cl")
    lh.sql(f"CREATE TABLE t_dev SHALLOW CLONE t VERSION AS OF 0 LOCATION '{dest}'")
    assert lh.sql("SELECT count(*) AS n FROM t_dev").collect()[0].n == 1


def test_catalog_persists_and_drop(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    # a fresh Lakehouse over the same warehouse sees the registration
    lh2 = Lakehouse(spark, warehouse=lh.warehouse)
    assert lh2.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1
    shown = {r.table for r in lh2.sql("SHOW TABLES").collect()}
    assert shown == {"t"}
    lh2.sql("DROP TABLE t")
    assert lh2.sql("SHOW TABLES").count() == 0
    assert os.path.isdir(t.root)  # external semantics: data intact
    lh2.sql("DROP TABLE IF EXISTS t")  # absent + IF EXISTS: no raise
    with pytest.raises(KeyError):
        lh2.sql("DROP TABLE t")


def test_unsupported_statement_raises(spark, lh):
    with pytest.raises(ValueError, match="unsupported"):
        lh.sql("GRANT SELECT ON t TO role")


def test_views_persist_and_expand(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)], lh=lh)
    lh.sql("CREATE VIEW a_rows AS SELECT * FROM t WHERE cat = 'a'")
    lh.sql("CREATE VIEW a_total AS SELECT sum(amt) AS s FROM a_rows")  # view-on-view
    assert lh.sql("SELECT s FROM a_total").collect()[0].s == 4.0
    # views are logical: new data shows up without re-creating them
    lh.sql("INSERT INTO t VALUES (4, 'a', 10.0)")
    assert lh.sql("SELECT s FROM a_total").collect()[0].s == 14.0
    # persisted across Lakehouse instances
    lh2 = Lakehouse(spark, warehouse=lh.warehouse)
    assert lh2.sql("SELECT s FROM a_total").collect()[0].s == 14.0
    assert {r.view for r in lh2.sql("SHOW VIEWS").collect()} == {"a_rows", "a_total"}
    lh2.sql("DROP VIEW a_rows")
    with pytest.raises(KeyError):
        lh2.sql("DROP VIEW a_rows")
    lh2.sql("DROP VIEW IF EXISTS a_rows")


def test_show_partitions_and_tblproperties(spark, tmp_path, lh):
    _mk(
        spark,
        tmp_path,
        [(1, "a", 1.0), (2, "b", 2.0)],
        lh=lh,
        partition_by=["cat"],
    )
    parts = {r.cat for r in lh.sql("SHOW PARTITIONS t").collect()}
    assert parts == {"a", "b"}
    lh.sql("ALTER TABLE t SET TBLPROPERTIES ('team' = 'data')")
    props = {r.key: r.value for r in lh.sql("SHOW TBLPROPERTIES t").collect()}
    assert props["team"] == '"data"'


def test_reorg_purges_deletion_vectors(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(i, "a", float(i)) for i in range(100)], lh=lh)
    lh.sql("DELETE FROM t WHERE id = 3")  # selective → deletion vector
    if t.detail()["num_dv_masked_files"] == 0:
        pytest.skip("delete did not take the DV path at this size")
    lh.sql("REORG TABLE t APPLY (PURGE)")
    assert t.detail()["num_dv_masked_files"] == 0
    assert lh.sql("SELECT count(*) AS n FROM t").collect()[0].n == 99


def test_alter_add_columns_multi(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    lh.sql("ALTER TABLE t ADD COLUMNS (note string, score double)")
    cols = t.read().columns
    assert "note" in cols and "score" in cols


def test_cache_table_pins_a_snapshot(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    lh.sql("CACHE TABLE t")
    lh.sql("INSERT INTO t VALUES (2, 'b', 2.0)")
    # cached pin: SELECT sees the snapshot taken at CACHE time
    assert lh.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1
    lh.sql("UNCACHE TABLE t")
    assert lh.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2


def test_review_fixes_literals_types_and_dotted_cache(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)])
    lh.register("bronze.claims", t.root)
    # dotted CACHE pin must keep SELECTs working (text rewrite to the
    # mangled pinned view)
    lh.sql("CACHE TABLE bronze.claims")
    assert lh.sql("SELECT count(*) AS n FROM bronze.claims").collect()[0].n == 1
    lh.sql("UNCACHE TABLE bronze.claims")
    # a string literal containing the table name is NOT rewritten
    row = lh.sql(
        "SELECT 'bronze.claims' AS src FROM bronze.claims"
    ).collect()[0]
    assert row.src == "bronze.claims"
    # UPDATE with 'where' inside a literal: the literal survives, the
    # statement has no real WHERE so every row updates
    lh.register("t", t.root)
    lh.sql("UPDATE t SET cat = 'apply where needed'")
    assert lh.sql("SELECT cat FROM t").collect()[0].cat == "apply where needed"
    # generic types with commas parse in CREATE and ALTER
    loc = str(tmp_path / "generic")
    lh.sql(
        f"CREATE TABLE gt (id int, m map<string,int>) USING DELTA LOCATION '{loc}'"
    )
    lh.sql("ALTER TABLE gt ADD COLUMNS (s struct<a:int,b:string>, tag string)")
    cols = dict(lh.table("gt").read().dtypes)
    assert cols["m"] == "map<string,int>"
    assert cols["s"] == "struct<a:int,b:string>"


def test_block_comments_and_double_quoted_literals(spark, tmp_path, lh):
    """Round-7 ADVICE (low): /* */ block comments must strip outside
    quotes, and double-quoted string literals (Spark's default reading
    of \"...\") must be protected from dotted-name rewriting."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0)])
    lh.register("bronze.claims", t.root)
    # block comment before and inside the statement
    got = lh.sql(
        "/* header\ncomment */ SELECT /* inline */ id FROM bronze.claims"
    ).collect()
    assert [r.id for r in got] == [1]
    # a double-quoted literal containing the dotted table name survives
    row = lh.sql(
        'SELECT "bronze.claims" AS src, id FROM bronze.claims'
    ).collect()[0]
    assert row.src == "bronze.claims"
    # a literal containing /* is not treated as a comment
    row = lh.sql("SELECT '/* not a comment */' AS s FROM bronze.claims").collect()[0]
    assert row.s == "/* not a comment */"


def test_insert_values_multirow_with_defaults_identity(spark, tmp_path, lh):
    """Round-7 verdict item 8: multi-row INSERT ... VALUES routed
    through append with DEFAULTs and identity columns honored."""
    df = spark.createDataFrame([], "name string, score double, tag string")
    root = str(tmp_path / "ins")
    t = ParquetTable.create(spark, root, df)
    t.add_identity_column("rid")
    t.set_default("tag", "'untagged'")
    lh.register("ins", root)
    lh.sql(
        "INSERT INTO ins (name, score) VALUES "
        "('a', 1.5), ('b', 2.5), ('c', 3.5)"
    )
    rows = lh.sql("SELECT * FROM ins ORDER BY rid").collect()
    assert [r.name for r in rows] == ["a", "b", "c"]
    assert all(r.tag == "untagged" for r in rows)
    assert len({r.rid for r in rows}) == 3  # identity assigned, unique


def _cdc_events(spark, rows, view):
    df = spark.createDataFrame(
        rows, "id int, name string, amt double, ts string, op string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.createOrReplaceTempView(view)
    return df


def test_apply_changes_sql_scd1_matches_python(spark, tmp_path, lh):
    """Round-8 verdict item 5: the DLT statement form routes to the same
    apply_changes_batch engine — SCD1 results row-for-row identical to
    the Python path, including the delete predicate, late-event floor,
    and EXCEPT column pruning."""
    from azure_databricks_lakehouse_spark.streaming.apply_changes import (
        apply_changes_batch,
    )

    rows1 = [
        (1, "a0", 1.0, "2024-01-01 00:00:00", "U"),
        (1, "a1", 2.0, "2024-01-01 00:05:00", "U"),
        (2, "b0", 5.0, "2024-01-01 00:01:00", "U"),
        (3, "c0", 7.0, "2024-01-01 00:02:00", "U"),
    ]
    rows2 = [
        (1, "stale", 0.0, "2023-12-31 00:00:00", "U"),  # late -> dropped
        (2, None, None, "2024-01-02 00:00:00", "D"),    # delete
        (4, "d0", 4.0, "2024-01-02 00:00:00", "U"),     # new key
    ]
    src1 = _cdc_events(spark, rows1, "cdc1")
    src2 = _cdc_events(spark, rows2, "cdc2")

    py_root = str(tmp_path / "py_t")
    kw = dict(keys=["id"], sequence_by="ts", apply_as_deletes="op = 'D'",
              except_columns=("op",))
    apply_changes_batch(spark, py_root, src1, **kw)
    apply_changes_batch(spark, py_root, src2, **kw)

    for stmt_src in ("cdc1", "cdc2"):
        lh.sql(
            f"APPLY CHANGES INTO sqlt FROM {stmt_src} KEYS (id) "
            "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts "
            "COLUMNS * EXCEPT (op) STORED AS SCD TYPE 1"
        )
    py = ParquetTable.for_path(spark, py_root).read()
    sq = lh.sql("SELECT * FROM sqlt")
    assert sorted(py.columns) == sorted(sq.columns)
    key = lambda r: r["id"]
    assert sorted(py.collect(), key=key) == sorted(sq.collect(), key=key)
    got = {r.id: (r.name, r.amt) for r in sq.collect()}
    assert got == {1: ("a1", 2.0), 3: ("c0", 7.0), 4: ("d0", 4.0)}
    # re-running the last statement leaves the STATE unchanged (upsert
    # replays are floored; the replayed delete re-fires against its
    # already-absent key — SCD1's documented no-tombstone caveat — but
    # deletes nothing)
    lh.sql(
        "APPLY CHANGES INTO sqlt FROM cdc2 KEYS (id) "
        "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts "
        "COLUMNS * EXCEPT (op) STORED AS SCD TYPE 1"
    )
    again = {r.id: (r.name, r.amt) for r in lh.sql("SELECT * FROM sqlt").collect()}
    assert again == got


def test_apply_changes_sql_scd2_matches_python(spark, tmp_path, lh):
    """SCD TYPE 2 via SQL: history (open/close intervals, delete closes
    the current version) identical to the Python path on the same feed;
    the source here is a registered TABLE, not a temp view."""
    from azure_databricks_lakehouse_spark.streaming.apply_changes import (
        apply_changes_batch,
    )

    rows1 = [
        (1, "v1", 1.0, "2024-01-01 00:00:00", "U"),
        (2, "w1", 2.0, "2024-01-01 00:00:00", "U"),
    ]
    rows2 = [
        (1, "v2", 1.5, "2024-01-02 00:00:00", "U"),   # new version
        (2, None, None, "2024-01-03 00:00:00", "D"),  # delete closes
    ]
    feed1 = _cdc_events(spark, rows1, "h1")
    feed2 = _cdc_events(spark, rows2, "h2")
    ParquetTable.create(spark, str(tmp_path / "feed1"), feed1)
    ParquetTable.create(spark, str(tmp_path / "feed2"), feed2)
    lh.register("feed1", str(tmp_path / "feed1"))
    lh.register("feed2", str(tmp_path / "feed2"))

    py_root = str(tmp_path / "py_h")
    kw = dict(keys=["id"], sequence_by="ts", apply_as_deletes="op = 'D'",
              except_columns=("op",), scd_type=2)
    apply_changes_batch(spark, py_root, feed1, **kw)
    apply_changes_batch(spark, py_root, feed2, **kw)

    for src in ("feed1", "feed2"):
        lh.sql(
            f"APPLY CHANGES INTO hist FROM {src} KEYS (id) "
            "APPLY AS DELETE WHEN op = 'D' SEQUENCE BY ts "
            "EXCEPT (op) STORED AS SCD TYPE 2"
        )
    py = ParquetTable.for_path(spark, py_root).read()
    sq = lh.sql("SELECT * FROM hist")
    assert sorted(py.columns) == sorted(sq.columns)
    key = lambda r: (r["id"], str(r["effective_from"]))
    assert sorted(py.collect(), key=key) == sorted(sq.collect(), key=key)
    # shape: id=1 has two versions (v1 closed, v2 open); id=2's only
    # version is closed by the delete with no successor
    cur = {
        r.id: r.name
        for r in sq.filter(F.col("is_current") & F.col("name").isNotNull()).collect()
    }
    assert cur == {1: "v2"}


def test_apply_changes_sql_rejects_malformed(spark, tmp_path, lh):
    _cdc_events(spark, [(1, "a", 1.0, "2024-01-01 00:00:00", "U")], "cdcx")
    with pytest.raises(ValueError, match="KEYS"):
        lh.sql("APPLY CHANGES INTO t2 FROM cdcx SEQUENCE BY ts")
    with pytest.raises(ValueError, match="APPLY CHANGES"):
        lh.sql("APPLY CHANGES cdcx KEYS (id) SEQUENCE BY ts")


def test_sql_script_multi_statement(spark, tmp_path, lh):
    """Notebook-cell parity: several ;-separated statements run in
    order; the LAST statement's frame is returned; semicolons inside
    string literals and comments never split."""
    out = lh.sql_script(
        f"""
        CREATE TABLE s1 (id int, note string)
        USING PARQUET LOCATION '{tmp_path / "wh" / "s1"}';

        -- a comment with a ; inside stays a comment
        INSERT INTO s1 VALUES (1, 'a;b'), (2, 'plain');
        /* block; comment; too */
        INSERT INTO s1 VALUES (3, 'c');

        SELECT id, note FROM s1 ORDER BY id;
        """
    )
    rows = out.collect()
    assert [(r["id"], r["note"]) for r in rows] == [
        (1, "a;b"),
        (2, "plain"),
        (3, "c"),
    ]


def test_sql_script_mid_failure_keeps_prior_commits(spark, tmp_path, lh):
    """Each statement is its own transaction (Delta contract): a failing
    statement raises, but the preceding ones have committed."""
    lh.sql(
        f"CREATE TABLE s2 (id int, note string) "
        f"USING PARQUET LOCATION '{tmp_path / 'wh' / 's2'}'"
    )
    with pytest.raises(ValueError, match="unsupported statement"):
        lh.sql_script(
            "INSERT INTO s2 VALUES (1, 'kept'); FROBNICATE s2; "
            "INSERT INTO s2 VALUES (2, 'never')"
        )
    got = [r["id"] for r in lh.sql("SELECT id FROM s2").collect()]
    assert got == [1]
    with pytest.raises(ValueError, match="empty script"):
        lh.sql_script(" ; -- nothing\n ; ")


def test_show_create_table_round_trips(spark, tmp_path, lh):
    """SHOW CREATE TABLE emits DDL this front-end re-executes: column
    clauses (NOT NULL / DEFAULT / GENERATED / IDENTITY), partitioning,
    user TBLPROPERTIES, and follow-up ALTER rows for CHECK constraints
    reconstruct an equivalent table at a new location."""
    loc1 = str(tmp_path / "wh" / "sct1")
    lh.sql(
        f"""CREATE TABLE sct1 (
          rid bigint GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
          id int NOT NULL,
          cat string DEFAULT 'misc',
          amt double,
          amt2 double GENERATED ALWAYS AS (amt * 2)
        ) USING PARQUET PARTITIONED BY (cat) LOCATION '{loc1}'
        TBLPROPERTIES ('owner' = 'pipelines', 'cdf_overwrite' = true)"""
    )
    lh.sql("ALTER TABLE sct1 ADD CONSTRAINT amt_pos CHECK (amt >= 0)")
    stmts = [r["createtab_stmt"] for r in lh.sql("SHOW CREATE TABLE sct1").collect()]
    assert len(stmts) == 2 and stmts[1].startswith("ALTER TABLE sct1")
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2)" in stmts[0]
    assert "'owner' = 'pipelines'" in stmts[0] and "'cdf_overwrite' = true" in stmts[0]
    # engine-state props never leak into the DDL
    lh.sql("ANALYZE TABLE sct1 COMPUTE STATISTICS NOSCAN")
    again = lh.sql("SHOW CREATE TABLE sct1").collect()[0]["createtab_stmt"]
    assert "statistics" not in again

    loc2 = str(tmp_path / "wh" / "sct2")
    for s in stmts:
        lh.sql(
            s.replace("sct1", "sct2").replace(f"'{loc1}'", f"'{loc2}'")
        )
    lh.sql("INSERT INTO sct2 (id, amt) VALUES (1, 3.0)")
    row = lh.sql("SELECT * FROM sct2").collect()[0]
    # identity, default, and generated columns all fire on the clone
    assert (row["rid"], row["cat"], row["amt2"]) == (10, "misc", 6.0)
    import pytest as _pytest

    with _pytest.raises(Exception, match="amt_pos"):
        lh.sql("INSERT INTO sct2 (id, amt) VALUES (2, -1.0)")
    # schema + partitioning match the original
    a = {r["col_name"]: r["data_type"] for r in lh.sql("DESCRIBE EXTENDED sct1").collect()}
    b = {r["col_name"]: r["data_type"] for r in lh.sql("DESCRIBE EXTENDED sct2").collect()}
    for c in ("rid", "id", "cat", "amt", "amt2", "Partition Columns"):
        assert a[c] == b[c]


def test_split_statements_edges():
    """Pure-lexer edges: unterminated constructs never split mid-token,
    trailing statements without ';' run, empty/comment-only segments
    are skipped by sql_script's filter (not the splitter)."""
    from azure_databricks_lakehouse_spark.sources.sql import _split_statements

    assert _split_statements("a; b ; c") == ["a", "b", "c"]
    assert _split_statements("SELECT 'a;b'; next") == ["SELECT 'a;b'", "next"]
    assert _split_statements("x -- tail; comment") == ["x -- tail; comment"]
    assert _split_statements("x /* a;b */ y; z") == ["x /* a;b */ y", "z"]
    # unterminated quote: the rest of the script is one statement
    assert _split_statements("SELECT 'oops; still; one") == [
        "SELECT 'oops; still; one"
    ]
    # unterminated block comment swallows the rest without splitting
    assert _split_statements("x /* never closed; y; z") == [
        "x /* never closed; y; z"
    ]
    assert _split_statements(" ;; ") == []


def test_delete_where_in_subquery(spark, tmp_path, lh):
    """DELETE ... WHERE col IN (SELECT ...) routes through the
    delete-only MERGE: matched rows go, NULL subquery keys never match,
    duplicates in the subquery are deduplicated; NOT IN (round-10)
    matches nothing here because the subquery carries a NULL key (SQL
    three-valued logic) — and commits nothing."""
    t = _mk(spark, tmp_path, [(i, "a" if i < 3 else "b", float(i)) for i in range(6)], lh=lh)
    spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (99,)], "vid int"
    ).createOrReplaceTempView("victims")
    out = lh.sql(
        "DELETE FROM t WHERE id IN (SELECT vid FROM victims)"
    ).collect()[0]
    assert out["num_affected_rows"] == 2
    assert sorted(r["id"] for r in t.read().collect()) == [0, 3, 4, 5]
    # NULL row in the TARGET is never deleted by IN either
    t.append(spark.createDataFrame([(None, "b", 9.0)], "id int, cat string, amt double"))
    lh.sql("DELETE FROM t WHERE id IN (SELECT vid FROM victims)")
    assert t.read().where(F.col("id").isNull()).count() == 1
    # round-10: NOT IN is supported; the NULL subquery key makes it
    # match nothing (and commit nothing) instead of raising
    before = t.latest_version()
    out = lh.sql(
        "DELETE FROM t WHERE id NOT IN (SELECT vid FROM victims)"
    ).collect()[0]
    assert out["num_affected_rows"] == 0
    assert t.latest_version() == before
    with pytest.raises(ValueError, match="one column"):
        lh.sql("DELETE FROM t WHERE id IN (SELECT vid, vid FROM victims)")


def test_update_where_in_subquery(spark, tmp_path, lh):
    """UPDATE ... WHERE col IN (SELECT ...) routes through the
    update-only MERGE (the round-8 verdict's DELETE/UPDATE asymmetry,
    closed): matched rows get row-wise post-images, NULL subquery keys
    never match, subquery duplicates are deduplicated, and NOT IN
    (round-10) applies SQL three-valued logic — all mirroring
    DELETE."""
    t = _mk(
        spark,
        tmp_path,
        [(i, "a" if i < 3 else "b", float(i)) for i in range(6)],
        lh=lh,
    )
    spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (99,)], "vid int"
    ).createOrReplaceTempView("u_victims")
    out = lh.sql(
        "UPDATE t SET amt = amt * 10, cat = 'hit' "
        "WHERE id IN (SELECT vid FROM u_victims)"
    ).collect()[0]
    assert out["num_affected_rows"] == 2
    rows = {r["id"]: (r["cat"], r["amt"]) for r in t.read().collect()}
    assert rows[1] == ("hit", 10.0) and rows[2] == ("hit", 20.0)
    assert rows[0] == ("a", 0.0) and rows[5] == ("b", 5.0)
    # NULL row in the TARGET is never updated by IN either
    t.append(
        spark.createDataFrame(
            [(None, "n", 9.0)], "id int, cat string, amt double"
        )
    )
    lh.sql("UPDATE t SET cat = 'x' WHERE id IN (SELECT vid FROM u_victims)")
    assert t.read().where(F.col("id").isNull()).first()["cat"] == "n"
    # round-10: NOT IN supported; NULL subquery key => zero matches
    before = t.latest_version()
    out = lh.sql(
        "UPDATE t SET amt = 0 WHERE id NOT IN (SELECT vid FROM u_victims)"
    ).collect()[0]
    assert out["num_affected_rows"] == 0
    assert t.latest_version() == before
    with pytest.raises(ValueError, match="one column"):
        lh.sql(
            "UPDATE t SET amt = 0 WHERE id IN (SELECT vid, vid FROM u_victims)"
        )
    with pytest.raises(ValueError, match="membership column"):
        lh.sql(
            "UPDATE t SET id = -id WHERE id IN (SELECT vid FROM u_victims)"
        )
    with pytest.raises(ValueError, match="entire"):
        lh.sql(
            "UPDATE t SET amt = 0 "
            "WHERE cat = 'a' AND id IN (SELECT vid FROM u_victims)"
        )


def test_update_where_in_rowwise_on_duplicate_key_target(spark, tmp_path, lh):
    """The differentiator vs MERGE's group-replace: a duplicate-key
    target keeps BOTH rows, each updated independently from its own
    pre-image — exact row-wise UPDATE semantics (Databricks parity)."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    t.append(
        spark.createDataFrame([(1, "z", 9.0)], "id int, cat string, amt double")
    )
    spark.createDataFrame([(1,)], "vid int").createOrReplaceTempView(
        "u_dup_victims"
    )
    out = lh.sql(
        "UPDATE t SET amt = amt + 0.5 "
        "WHERE id IN (SELECT vid FROM u_dup_victims)"
    ).collect()[0]
    assert out["num_affected_rows"] == 2
    rows = sorted(
        (r["id"], r["cat"], r["amt"]) for r in t.read().collect()
    )
    assert rows == [(1, "a", 1.5), (1, "z", 9.5), (2, "b", 2.0)]
    # swap semantics: every RHS reads the PRE-update row
    lh.sql("ALTER TABLE t ADD COLUMN amt2 double")
    lh.sql("UPDATE t SET amt2 = amt WHERE id = 2")
    lh.sql(
        "UPDATE t SET amt = amt2, amt2 = amt "
        "WHERE id IN (SELECT vid + 1 FROM u_dup_victims)"
    )
    r2 = t.read().filter("id = 2").first()
    assert (r2["amt"], r2["amt2"]) == (2.0, 2.0)
    lh.sql("UPDATE t SET amt = 7.0 WHERE id = 2")
    lh.sql(
        "UPDATE t SET amt = amt2, amt2 = amt "
        "WHERE id IN (SELECT vid + 1 FROM u_dup_victims)"
    )
    r2 = t.read().filter("id = 2").first()
    assert (r2["amt"], r2["amt2"]) == (2.0, 7.0)  # swapped, not chained


def test_tuple_in_subquery_dml(spark, tmp_path, lh):
    """Composite-key membership (Databricks tuple-IN): both DELETE and
    UPDATE accept ``(a, b) IN (SELECT x, y ...)`` — a key row with ANY
    NULL component never matches, and the rewrite merges on all
    components."""
    t = _mk(
        spark,
        tmp_path,
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(8)],
        lh=lh,
    )
    spark.createDataFrame(
        [(2, "a"), (3, "b"), (3, "a"), (None, "a"), (4, None)],
        "vid int, vcat string",
    ).createOrReplaceTempView("tv")
    out = lh.sql(
        "UPDATE t SET amt = amt + 100 "
        "WHERE (id, cat) IN (SELECT vid, vcat FROM tv)"
    ).collect()[0]
    # (2,'a') and (3,'b') match; (3,'a') doesn't exist; NULL rows never
    assert out["num_affected_rows"] == 2
    rows = {r["id"]: r["amt"] for r in t.read().collect()}
    assert rows[2] == 102.0 and rows[3] == 103.0 and rows[4] == 4.0
    out = lh.sql(
        "DELETE FROM t WHERE (id, cat) IN (SELECT vid, vcat FROM tv)"
    ).collect()[0]
    assert out["num_affected_rows"] == 2
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 4, 5, 6, 7]
    # arity mismatch raises cleanly
    with pytest.raises(ValueError, match="2 column"):
        lh.sql("DELETE FROM t WHERE (id, cat) IN (SELECT vid FROM tv)")
    # assigning a membership component raises
    with pytest.raises(ValueError, match="membership"):
        lh.sql(
            "UPDATE t SET cat = 'x' "
            "WHERE (id, cat) IN (SELECT vid, vcat FROM tv)"
        )


def test_update_where_in_zero_match_commits_nothing(spark, tmp_path, lh):
    t = _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    v0 = t.latest_version()
    out = lh.sql(
        "UPDATE t SET amt = 0 WHERE id IN (SELECT col1 FROM VALUES (42))"
    ).collect()[0]
    assert out["num_affected_rows"] == 0 and out["version"] == v0
    assert t.latest_version() == v0


def test_percol_merge_on_duplicate_key_target_group_replaces(spark, tmp_path, lh):
    """Found by the SQL-vs-Python hypothesis sweep: a target holding
    DUPLICATE keys (append after init) expands the per-column MERGE's
    pre-image join, and the copies used to trip the duplicate-source
    validator.  A key-unique source must group-replace (both engine
    paths agree); a SET expression that reads the differing target
    pre-images stays a genuine nondeterminism abort."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    t.append(spark.createDataFrame([(1, "a", 9.0)], "id int, cat string, amt double"))
    assert t.read().filter(F.col("id") == 1).count() == 2
    lh.sql(
        "MERGE INTO t USING (SELECT 1 AS id, 5.0 AS amt) AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (id, cat, amt) VALUES (s.id, 'n', s.amt)"
    )
    rows = sorted((r["id"], r["amt"]) for r in t.read().collect())
    assert rows == [(1, 5.0), (2, 2.0)]  # group-replaced, deterministic
    # target-dependent SET over differing pre-images: still aborts
    t.append(spark.createDataFrame([(2, "b", 7.0)], "id int, cat string, amt double"))
    with pytest.raises(ValueError, match="DUPLICATE rows for a matched key"):
        lh.sql(
            "MERGE INTO t USING (SELECT 2 AS id) AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET amt = t.amt + 1"
        )


def test_merge_with_schema_evolution_star(spark, tmp_path, lh):
    """``MERGE WITH SCHEMA EVOLUTION INTO`` (Databricks SQL): the star
    expansion takes the SOURCE's column set — new columns widen the
    table, carried rows read NULL.  Without the clause, star forms keep
    today's contract (source-only columns are meta, never stored)."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    src = (
        "SELECT 2 AS id, 'b' AS cat, 9.0 AS amt, 'n2' AS note "
        "UNION ALL SELECT 3, 'c', 3.0, 'n3'"
    )
    # no clause: note is consumed as meta, not evolved
    lh.sql(
        f"MERGE INTO t USING ({src}) AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert "note" not in t.read().columns
    # with the clause: note evolves in, NULL for rows the merge missed
    lh.sql(
        f"MERGE WITH SCHEMA EVOLUTION INTO t USING ({src}) AS s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {r["id"]: (r["amt"], r["note"]) for r in t.read().collect()}
    assert rows == {1: (1.0, None), 2: (9.0, "n2"), 3: (3.0, "n3")}


def test_merge_with_schema_evolution_percol(spark, tmp_path, lh):
    """Per-column WITH SCHEMA EVOLUTION: a SET/INSERT naming an unknown
    column widens the table with the expression's inferred type; without
    the clause the same statement raises toward it."""
    t = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    stmt_tail = (
        "USING (SELECT 1 AS id, 50 AS score UNION ALL SELECT 9, 70) AS s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET score = s.score * 2 "
        "WHEN NOT MATCHED THEN INSERT (id, cat, amt, score) "
        "VALUES (s.id, 'new', 0.0, s.score)"
    )
    with pytest.raises(ValueError, match="SCHEMA EVOLUTION"):
        lh.sql(f"MERGE INTO t {stmt_tail}")
    lh.sql(f"MERGE WITH SCHEMA EVOLUTION INTO t {stmt_tail}")
    rows = {r["id"]: r["score"] for r in t.read().collect()}
    assert rows == {1: 100, 2: None, 9: 70}
    # the inferred type is the expression's, not a string default
    assert dict(t.read().dtypes)["score"] in ("int", "bigint")


def test_plain_describe_and_show_columns(spark, tmp_path, lh):
    _mk(spark, tmp_path, [(1, "a", 1.0)], lh=lh)
    d = lh.sql("DESCRIBE t").collect()
    assert [(r["col_name"], r["data_type"]) for r in d] == [
        ("id", "int"), ("cat", "string"), ("amt", "double"),
    ]
    assert [r["col_name"] for r in lh.sql("SHOW COLUMNS IN t").collect()] == [
        "id", "cat", "amt",
    ]
    # DESC abbreviation and FROM spelling both route
    assert lh.sql("DESC t").count() == 3
    assert lh.sql("SHOW COLUMNS FROM t").count() == 3
    # HISTORY/DETAIL/EXTENDED keywords still take precedence over names
    assert lh.sql("DESCRIBE HISTORY t").count() >= 1


def test_explain_routes_through_engine_paths(spark, tmp_path, lh):
    """EXPLAIN shows what would ACTUALLY run through this front-end:
    the metadata-only COUNT fast path plans as a scan-free constant,
    while a filtered query shows the real parquet scan with the
    predicate pushed."""
    _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], lh=lh)
    lh.sql("ANALYZE TABLE t COMPUTE STATISTICS NOSCAN")
    plan = lh.sql("EXPLAIN SELECT COUNT(*) FROM t").collect()[0]["plan"]
    assert "OneRowRelation" in plan and "parquet" not in plan
    plan = lh.sql(
        "EXPLAIN FORMATTED SELECT id FROM t WHERE amt > 1.5"
    ).collect()[0]["plan"]
    assert "Scan parquet" in plan and "PushedFilters" in plan
    assert lh.sql("EXPLAIN EXTENDED SELECT id FROM t").columns == ["plan"]
    with pytest.raises(ValueError, match="queries only"):
        lh.sql("EXPLAIN DELETE FROM t")


def test_truncate_table(spark, tmp_path, lh):
    """TRUNCATE drops every row in one metadata-only commit (no data
    rewrite — whole files leave the manifest), stays time-travelable,
    and an already-empty table commits nothing."""
    t = _mk(spark, tmp_path, [(i, "a", float(i)) for i in range(6)], lh=lh)
    v0 = t.latest_version()
    out = lh.sql("TRUNCATE TABLE t").collect()[0]
    assert out["num_affected_rows"] == 6
    assert t.read().count() == 0
    assert t.read(version=v0).count() == 6  # pre-truncate time travel
    files_added = t.history(limit=1)[0].metrics.get("files_added", 0)
    assert files_added == 0  # metadata-only: nothing rewritten
    v1 = t.latest_version()
    out = lh.sql("TRUNCATE TABLE t").collect()[0]
    assert out["num_affected_rows"] == 0 and t.latest_version() == v1
    lh.sql(f"RESTORE TABLE t TO VERSION AS OF {v0}")
    assert t.read().count() == 6


def test_rowwise_dml_subquery_text_inside_string_literal(spark, tmp_path, lh):
    """'(select ...)' appearing INSIDE a string literal is data, not a
    subquery: the guard must mask literals before the presence check,
    so these row-wise statements run instead of raising (advice r9)."""
    _mk(
        spark,
        tmp_path,
        [(1, "x (select y)", 1.0), (2, "plain", 2.0)],
        lh=lh,
    )
    r = lh.sql(
        "UPDATE t SET amt = amt + 1 WHERE cat = 'x (select y)'"
    ).collect()[0]
    assert r.num_affected_rows == 1
    assert lh.sql("SELECT amt FROM t WHERE id = 1").first()[0] == 2.0
    r = lh.sql("DELETE FROM t WHERE cat = 'x (select y)'").collect()[0]
    assert r.num_affected_rows == 1
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()[0] == 1
    # a REAL embedded subquery in a compound predicate still raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="subqueries in UPDATE"):
        lh.sql(
            "UPDATE t SET amt = 0 WHERE id = 2 "
            "AND id IN (SELECT col1 FROM VALUES (2))"
        )


def test_show_tables_and_views(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh_show"))
    assert lh.sql("SHOW TABLES").count() == 0
    lh.sql("CREATE TABLE st1 AS SELECT 1 AS a")
    lh.sql("CREATE TABLE st2 AS SELECT 2 AS a")
    lh.sql("CREATE VIEW sv1 AS SELECT a FROM st1")
    t = {r.table: r.location for r in lh.sql("SHOW TABLES").collect()}
    assert set(t) == {"st1", "st2"}
    assert all(loc.startswith("/") for loc in t.values())
    v = {r.view: r.body for r in lh.sql("SHOW VIEWS").collect()}
    assert v == {"sv1": "SELECT a FROM st1"}
    lh.sql("DROP VIEW sv1")
    assert lh.sql("SHOW VIEWS").count() == 0
