"""ANALYZE TABLE COMPUTE STATISTICS (Spark/Databricks parity on the
versioned table layer).

The reference's platform exposes ``ANALYZE TABLE`` for CBO statistics
(Databricks SQL surface); here stats land as a versioned ``statistics``
table property: NOSCAN derives an EXACT row count from parquet footers
minus deletion-vector cardinality (zero data read), FOR COLUMNS runs one
aggregate-only scan, RESTORE rolls stats back with the data, and
DESCRIBE EXTENDED surfaces them with a staleness flag."""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


def _docs(spark, n=40):
    return spark.range(n).selectExpr(
        "cast(id as int) as k",
        "concat('word_', cast(id % 7 as string)) as w",
        "cast(id * 1.5 as double) as x",
        "case when id % 5 = 0 then null else cast(id as string) end as s",
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_noscan_rowcount_exact_without_data_scan(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.append(_docs(spark, 10))
    v = t.analyze(noscan=True)
    s = t.statistics()
    assert s["num_rows"] == 50
    assert s["noscan"] is True
    assert s["as_of_version"] == v - 1
    assert s["num_files"] >= 1 and s["size_bytes"] > 0
    assert "columns" not in s
    assert t.history()[-1].operation == "ANALYZE"


def test_noscan_subtracts_deletion_vectors(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.delete("k < 8", mode="merge-on-read")  # footers still say 40
    t.analyze(noscan=True)
    assert t.statistics()["num_rows"] == 32
    assert t.statistics()["num_rows"] == t.read().count()
    # the column-stats scan applies the same DV mask: min reflects the
    # deletion, not the footer
    t.analyze(["k"])
    ks = t.statistics()["columns"]["k"]
    assert (ks["min"], ks["max"]) == (8, 39)
    assert t.statistics()["num_rows"] == 32


def test_column_stats_match_direct_aggregation(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.analyze(["k", "w", "s"])
    s = t.statistics()
    assert s["num_rows"] == 40
    ks = s["columns"]["k"]
    assert (ks["min"], ks["max"], ks["null_count"]) == (0, 39, 0)
    assert abs(ks["distinct_count_approx"] - 40) <= 4  # 5% rsd sketch
    ws = s["columns"]["w"]
    assert ws["min"] == "word_0" and ws["max"] == "word_6"
    assert ws["max_len"] == 6 and ws["avg_len"] == 6.0
    ss = s["columns"]["s"]
    assert ss["null_count"] == 8  # ids 0,5,...,35


def test_for_all_columns_skips_complex_explicit_raises(spark, root):
    df = spark.range(5).selectExpr(
        "cast(id as int) as k", "array(id) as arr"
    )
    t = ParquetTable.create(spark, root, df)
    t.analyze("all")
    assert set(t.statistics()["columns"]) == {"k"}  # arr skipped
    with pytest.raises(ValueError, match="array"):
        t.analyze(["arr"])
    with pytest.raises(KeyError):
        t.analyze(["nope"])
    with pytest.raises(ValueError, match="NOSCAN"):
        t.analyze(["k"], noscan=True)


def test_restore_rolls_stats_back_with_the_data(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 10))
    t.analyze(noscan=True)  # v1: stats say 10
    t.append(_docs(spark, 30))
    t.analyze(noscan=True)  # v3: stats say 40
    assert t.statistics()["num_rows"] == 40
    t.restore(1)
    assert t.statistics()["num_rows"] == 10
    assert t.read().count() == 10


def test_sql_analyze_and_describe_extended(spark, tmp_path):
    lh = Lakehouse(spark, str(tmp_path / "wh"))
    _docs(spark, 25).createOrReplaceTempView("src_docs")
    lh.sql(
        f"CREATE TABLE t1 USING PARQUET LOCATION '{tmp_path / 'wh' / 't1'}' "
        "AS SELECT * FROM src_docs"
    )
    row = lh.sql(
        "ANALYZE TABLE t1 COMPUTE STATISTICS FOR COLUMNS k, w"
    ).collect()[0]
    assert row["num_rows"] == 25 and row["num_cols_analyzed"] == 2

    ext = lh.sql("DESCRIBE EXTENDED t1").collect()
    by_name = {r["col_name"]: r for r in ext}
    assert by_name["k"]["data_type"] == "int"
    assert by_name["Num Rows"]["data_type"] == "25"
    assert by_name["Num Rows"]["comment"] == ""  # fresh, not stale
    assert "Column Stats: k" in by_name and "Column Stats: w" in by_name

    # a data-changing commit flips the staleness flag; NOSCAN clears it
    lh.sql("INSERT INTO t1 SELECT * FROM src_docs")
    ext2 = {r["col_name"]: r for r in lh.sql("DESCRIBE EXTENDED t1").collect()}
    assert ext2["Num Rows"]["comment"] == "stale"
    noscan = lh.sql("ANALYZE TABLE t1 COMPUTE STATISTICS NOSCAN").collect()[0]
    assert noscan["num_rows"] == 50
    ext3 = {r["col_name"]: r for r in lh.sql("DESCRIBE EXTENDED t1").collect()}
    assert ext3["Num Rows"]["comment"] == ""

    with pytest.raises(ValueError, match="supported form"):
        lh.sql("ANALYZE TABLE t1 COMPUTE STATISTICS FOR SOME COLUMNS")
