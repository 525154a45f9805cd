"""Metadata-only ALTER TABLE via column mapping: ADD/DROP/RENAME COLUMN
must never touch a data file, reads/writes translate through the
logical↔physical mapping, and a re-added name can never resurrect
dropped data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _table(spark, root, partitioned=False):
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    return ParquetTable.create(
        spark, root, df, partition_by=["part"] if partitioned else None
    )


def _files(t):
    return list(t._manifest()["files"])


def test_add_column_is_metadata_only(spark, root):
    t = _table(spark, root)
    before = _files(t)
    t.add_column("score", "double")
    m = t._manifest()
    assert m["files"] == before and m["operation"] == "ADD COLUMN"
    got = t.read()
    assert got.schema["score"].dataType.simpleString() == "double"
    assert got.filter("score IS NOT NULL").count() == 0
    # writes after the add persist real values
    t.append(
        spark.createDataFrame([(500, "0", "x", 1.5)],
                              "k int, part string, v string, score double")
    )
    assert t.read().filter("score = 1.5").count() == 1


def test_drop_column_hides_without_rewrite(spark, root):
    t = _table(spark, root)
    before = _files(t)
    t.drop_column("v")
    m = t._manifest()
    assert m["files"] == before
    assert "v" not in t.read().columns
    assert t.read().count() == 100
    assert m["retired_cols"] == ["v"]


def test_drop_guards(spark, root):
    t = _table(spark, root, partitioned=True)
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("part")
    t.add_check_constraint("v_ok", "v IS NOT NULL")
    with pytest.raises(ValueError, match="CHECK constraints"):
        t.drop_column("v")
    t.drop_constraint("v_ok")
    t.set_bloom_index(["v"])
    with pytest.raises(ValueError, match="bloom-indexed"):
        t.drop_column("v")


def test_readd_after_drop_never_resurrects(spark, root):
    t = _table(spark, root)
    t.drop_column("v")
    t.add_column("v", "string")
    m = t._manifest()
    assert m["colmap"]["v"] != "v", "re-added column needs a fresh physical"
    # old files' dead 'v' data must NOT surface
    assert t.read().filter("v IS NOT NULL").count() == 0
    t.append(
        spark.createDataFrame([(999, "0", "fresh")], "k int, part string, v string")
    )
    vals = [r["v"] for r in t.read().filter("v IS NOT NULL").collect()]
    assert vals == ["fresh"]
    # appends may not smuggle the retired name in as a NEW column either
    t2 = _table(spark, root + "2")
    t2.drop_column("v")
    with pytest.raises(ValueError, match="add_column"):
        t2.append(
            spark.createDataFrame([(1, "0", "x")], "k int, part string, v string"),
            merge_schema=True,
        )


def test_rename_column_end_to_end(spark, root):
    t = _table(spark, root)
    before = _files(t)
    v_before = t.latest_version()
    t.rename_column("v", "label")
    m = t._manifest()
    assert m["files"] == before, "rename must not rewrite data"
    got = t.read()
    assert "label" in got.columns and "v" not in got.columns
    assert got.filter("label = 'v7'").count() == 1
    # time travel shows the OLD name at the old version
    old = t.read(version=v_before)
    assert "v" in old.columns and "label" not in old.columns
    # writes after the rename round-trip through the physical name
    t.append(
        spark.createDataFrame([(500, "0", "newrow")],
                              "k int, part string, label string")
    )
    assert t.read().filter("label = 'newrow'").count() == 1
    # DML with a SQL condition on the NEW name works (probe + CDC)
    t.delete("label = 'v7'")
    assert t.read().filter("label = 'v7'").count() == 0
    assert t.read().count() == 100
    # rename BACK restores the identity mapping
    t.rename_column("label", "v")
    assert t._manifest()["colmap"] == {}
    assert t.read().filter("v = 'v8'").count() == 1


def test_rename_keeps_bloom_and_not_null(spark, root):
    t = _table(spark, root)
    t.set_not_null("v")
    t.set_bloom_index(["v"], m_bits=2048, k=4)
    t.rename_column("v", "val")
    m = t._manifest()
    assert "val" in m["props"]["not_null"]
    assert m["props"]["bloom"]["cols"] == ["val"]
    got = t.scan_eq("val", "v37").collect()
    assert len(got) == 1 and got[0]["k"] == 37
    # NOT NULL still enforced under the new name
    from azure_databricks_lakehouse_spark.sources.tables import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame([(1, "0", None)],
                                  "k int, part string, val string")
        )


def test_rename_partition_column(spark, root):
    t = _table(spark, root, partitioned=True)
    t.rename_column("part", "bucket")
    got = t.read()
    assert "bucket" in got.columns
    assert got.filter("bucket = '2'").count() == 25
    # appends land in the right (physical) hive directory
    t.append(
        spark.createDataFrame([(500, "2", "x")], "k int, bucket string, v string")
    )
    assert t.read().filter("bucket = '2'").count() == 26
    assert any("part=2" in f for f in _files(t))
    # partition-pruned DML on the logical name
    before = set(_files(t))
    t.delete("bucket = '3' AND k = 3", mode="copy-on-write")
    untouched = {f for f in before if "part=3" not in f}
    assert untouched <= set(_files(t))
    assert t.read().count() == 100


def test_rename_with_dv_and_optimize(spark, root):
    t = _table(spark, root)
    t.delete("k = 5", mode="merge-on-read")
    t.rename_column("v", "doc")
    assert t.read().filter("k = 5").count() == 0
    assert t.read().filter("doc = 'v6'").count() == 1
    t.optimize()
    assert t._manifest()["dvs"] == {}
    assert t.read().count() == 99
    assert t.read().filter("doc = 'v6'").count() == 1


def test_scan_prunes_on_renamed_column(spark, root):
    df = spark.range(2000).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    t = ParquetTable.create(spark, root, df)
    t.optimize(zorder_by=["k"], n_files=16)
    t.rename_column("k", "key")
    rows = t.scan("key", lo=100, hi=110)
    assert rows.count() == 11
    # file skipping still engages on the renamed column: the scan opens
    # a strict subset (stats are keyed by the PHYSICAL name 'k')
    n_total = len(t._manifest()["files"])
    assert n_total >= 8
    assert 0 < len(rows.inputFiles()) < n_total / 2


def test_cdf_and_catalog_across_rename(spark, root):
    t = _table(spark, root)
    v0 = t.latest_version()
    t.rename_column("v", "txt")
    t.append(
        spark.createDataFrame([(700, "1", "after")],
                              "k int, part string, txt string")
    )
    ch = t.changes_between(v0)
    assert ch.filter("txt = 'after'").count() == 1
    t.register_catalog("alter_cat_tbl")
    try:
        assert (
            spark.sql("SELECT count(*) c FROM alter_cat_tbl WHERE txt = 'v3'")
            .first()["c"] == 1
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS alter_cat_tbl")


def test_constraint_commit_preserves_dvs(spark, root):
    """Regression: a metadata-only commit (properties/constraints) on a
    table carrying deletion vectors must not drop the DV map — that
    would silently resurrect deleted rows."""
    t = _table(spark, root)
    t.delete("k = 9", mode="merge-on-read")
    assert t.read().count() == 99
    t.set_properties({"owner": "me"})
    assert t.read().count() == 99, "properties commit lost the DV mask"
    t.add_check_constraint("k_pos", "k >= 0")
    assert t.read().count() == 99, "constraint commit lost the DV mask"


def test_timestamp_time_travel(spark, root):
    """Delta `timestampAsOf` parity: resolve a snapshot by commit time."""
    import time as _time

    t = _table(spark, root)
    ts_after_create = _time.time()
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(500, "0", "late")],
                                   "k int, part string, v string"))
    assert t.version_at(ts_after_create) == 0
    assert t.read(timestamp=ts_after_create).count() == 100
    assert t.read(timestamp=_time.time()).count() == 101
    with pytest.raises(ValueError, match="predates"):
        t.version_at(0.0)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, timestamp=ts_after_create)
    # ISO-8601 string form
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(ts_after_create, timezone.utc).isoformat()
    assert t.version_at(iso) == 0


def test_batch_cdf_spans_rename_under_current_names(spark, tmp_path):
    """changes_between across a rename_column boundary delivers every
    slice — appends AND DML sidecars written before the rename — under
    the END version's logical names, not a split old/new column pair."""
    import pyspark.sql.functions as F

    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    root = str(tmp_path / "tbl")
    t = ParquetTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string"),
    )
    t.update(F.col("k") == 1, {"v": F.lit("x2")})  # v1 sidecar, old names
    t.delete(F.col("k") == 2)  # v2 sidecar, old names
    t.rename_column("v", "label")  # v3
    t.append(spark.createDataFrame([(3, "z")], "k int, label string"))  # v4
    ch = t.changes_between(-1)
    assert "label" in ch.columns and "v" not in ch.columns
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["label"])
        for r in ch.collect()
    )
    assert got == [
        (0, "insert", 1, "x"),
        (0, "insert", 2, "y"),
        (1, "delete", 1, "x"),
        (1, "insert", 1, "x2"),
        (2, "delete", 2, "y"),
        (4, "insert", 3, "z"),
    ]


def _widen_table(spark, tmp_path):
    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    root = str(tmp_path / "wide")
    t = ParquetTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, float(i) / 2, "p1") for i in range(100)],
            "k int, x float, part string",
        ),
        partition_by=["part"],
    )
    return t


def test_alter_column_type_widens_metadata_only(spark, tmp_path):
    """int->long and float->double are one metadata commit: no data
    file is rewritten, old files read under the widened schema, and
    post-widen appends store the new type."""
    import os

    import pyspark.sql.functions as F

    t = _widen_table(spark, tmp_path)
    data_root = os.path.join(t.root, "data")
    mtimes = {
        f: os.path.getmtime(os.path.join(data_root, f))
        for f in t._manifest()["files"]
    }
    t.alter_column_type("k", "bigint")
    t.alter_column_type("x", "double")
    assert {
        f: os.path.getmtime(os.path.join(data_root, f)) for f in mtimes
    } == mtimes, "widening must not touch a data file"
    got = t.read()
    assert dict(got.dtypes)["k"] == "bigint"
    assert dict(got.dtypes)["x"] == "double"
    assert got.count() == 100
    # appends now carry genuinely-long values beside the int32 files
    t.append(
        spark.createDataFrame(
            [(2**40, 1.5, "p1")], "k bigint, x double, part string"
        )
    )
    assert t.read().filter(F.col("k") == 2**40).count() == 1
    assert t.read().count() == 101
    # stats pruning still correct across both file generations
    assert t.scan("k", lo=2**39).count() == 1
    assert t.scan("k", lo=0, hi=10).count() == 11
    # time travel: pre-widen versions read under the OLD schema
    old = t.read(version=0)
    assert dict(old.dtypes)["k"] == "int"
    assert old.count() == 100


def test_widening_rejects_lossy_changes(spark, tmp_path):
    import pytest

    t = _widen_table(spark, tmp_path)
    for bad in [("k", "int"), ("k", "float"), ("k", "string"),
                ("x", "float"), ("part", "bigint")]:
        with pytest.raises(ValueError):
            t.alter_column_type(*bad)


def test_widened_decimal_and_dml(spark, tmp_path):
    """Decimal growth widens metadata-only, and DML (probe + rewrite +
    DV) runs over the mixed-generation files."""
    import pyspark.sql.functions as F

    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    root = str(tmp_path / "dec")
    t = ParquetTable.create(
        spark,
        root,
        spark.sql(
            "select id as k, cast(id + 0.25 as decimal(6,2)) amt "
            "from range(50)"
        ),
    )
    t.alter_column_type("amt", "decimal(14,4)")
    t.append(
        spark.sql(
            "select 1000 as k, cast(123456789.1234 as decimal(14,4)) amt"
        )
    )
    assert t.read().count() == 51
    t.delete("k = 7", mode="merge-on-read")
    assert t.read().count() == 50
    t.update(F.col("k") == 8, {"amt": F.lit(None).cast("decimal(14,4)")})
    assert t.read().filter("amt is null").count() == 1


def test_widening_composes_with_rename(spark, tmp_path):
    """Widen then rename (or vice versa): explicit-schema reads resolve
    the physical column under the mapping at the widened type."""
    t = _widen_table(spark, tmp_path)
    t.alter_column_type("k", "bigint")
    t.rename_column("k", "key")
    t.append(
        spark.createDataFrame(
            [(2**40, 9.9, "p1")], "key bigint, x float, part string"
        )
    )
    got = t.read()
    assert dict(got.dtypes)["key"] == "bigint"
    assert got.filter("key >= 0").count() == 101


def test_key_constraints_informational(spark, tmp_path):
    """PRIMARY KEY / FOREIGN KEY (Databricks parity: informational,
    never enforced): metadata-only commits, one PK per table, shared
    constraint namespace, SHOW CREATE round-trips them as ALTER rows,
    DROP CONSTRAINT removes either kind."""
    from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh_kc"))
    lh.sql("CREATE TABLE dim (id INT, nm STRING)")
    lh.sql("CREATE TABLE fact (fid INT, did INT, amt DOUBLE)")
    lh.sql("ALTER TABLE dim ADD CONSTRAINT dim_pk PRIMARY KEY (id)")
    lh.sql(
        "ALTER TABLE fact ADD CONSTRAINT fact_dim_fk "
        "FOREIGN KEY (did) REFERENCES dim (id)"
    )
    # informational: a duplicate key INSERT is NOT rejected
    lh.sql("INSERT INTO dim VALUES (1, 'a'), (1, 'dup')")
    assert lh.sql("SELECT * FROM dim").count() == 2

    with pytest.raises(ValueError, match="PRIMARY KEY"):
        lh.sql("ALTER TABLE dim ADD CONSTRAINT pk2 PRIMARY KEY (nm)")
    with pytest.raises(ValueError, match="already exists"):
        lh.sql("ALTER TABLE dim ADD CONSTRAINT dim_pk CHECK (id > 0)")
    with pytest.raises(ValueError, match="no such columns"):
        lh.sql("ALTER TABLE dim ADD CONSTRAINT px PRIMARY KEY (zz)")

    ddl = "\n".join(
        r.createtab_stmt
        for r in lh.sql("SHOW CREATE TABLE fact").collect()
    )
    assert "FOREIGN KEY (did) REFERENCES dim (id)" in ddl
    # internal props never leak into TBLPROPERTIES (fact has no user props)
    assert "TBLPROPERTIES" not in ddl

    lh.sql("ALTER TABLE fact DROP CONSTRAINT fact_dim_fk")
    ddl2 = "\n".join(
        r.createtab_stmt
        for r in lh.sql("SHOW CREATE TABLE fact").collect()
    )
    assert "FOREIGN KEY" not in ddl2


def test_comments_table_and_column(spark, tmp_path):
    """COMMENT ON TABLE + ALTER COLUMN ... COMMENT: versioned props,
    DESCRIBE surfaces column comments, SHOW CREATE round-trips both as
    statement rows, NULL clears."""
    from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh_cm"))
    lh.sql("CREATE TABLE tc (id INT, nm STRING)")
    lh.sql("COMMENT ON TABLE tc IS 'the dim''s table'")
    lh.sql("ALTER TABLE tc ALTER COLUMN nm COMMENT 'display name'")

    desc = {r.col_name: r.comment for r in lh.sql("DESCRIBE tc").collect()}
    assert desc == {"id": "", "nm": "display name"}

    ddl = "\n".join(
        r.createtab_stmt for r in lh.sql("SHOW CREATE TABLE tc").collect()
    )
    assert "COMMENT ON TABLE tc IS 'the dim''s table'" in ddl
    assert "ALTER COLUMN nm COMMENT 'display name'" in ddl

    lh.sql("COMMENT ON TABLE tc IS NULL")
    lh.sql("ALTER TABLE tc ALTER COLUMN nm COMMENT NULL")
    ddl2 = "\n".join(
        r.createtab_stmt for r in lh.sql("SHOW CREATE TABLE tc").collect()
    )
    assert "COMMENT" not in ddl2
