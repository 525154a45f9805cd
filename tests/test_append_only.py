"""``delta.appendOnly`` table property (Delta parity): a table marked
append-only refuses every row-removing operation with a clear error,
while appends, OPTIMIZE (row-preserving by contract), metadata commits,
and reads stay allowed; unsetting the property restores full DML.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def lh(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    lh.sql(
        "CREATE TABLE t AS SELECT col1 AS k, col2 AS v FROM VALUES "
        "(1, 10), (2, 20)"
    )
    lh.sql("ALTER TABLE t SET TBLPROPERTIES ('delta.appendOnly' = 'true')")
    return lh


def test_row_removing_statements_refuse(lh):
    for stmt in (
        "DELETE FROM t WHERE k = 1",
        "UPDATE t SET v = 0 WHERE k = 1",
        "TRUNCATE TABLE t",
        "INSERT OVERWRITE t VALUES (9, 9)",
        "MERGE INTO t USING (SELECT 1 AS k, 5 AS v) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    ):
        with pytest.raises(ValueError, match="append-only"):
            lh.sql(stmt)
    # subquery DML routes hit the same gate
    lh.sql("CREATE TABLE keys AS SELECT col1 AS kk FROM VALUES (1)")
    with pytest.raises(ValueError, match="append-only"):
        lh.sql("DELETE FROM t WHERE k IN (SELECT kk FROM keys)")
    with pytest.raises(ValueError, match="append-only"):
        lh.sql("UPDATE t SET v = 1 WHERE k NOT IN (SELECT kk FROM keys)")


def test_appends_optimize_and_reads_still_allowed(lh):
    lh.sql("INSERT INTO t VALUES (3, 30)")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3
    lh.sql("OPTIMIZE t")  # row-preserving: allowed
    assert lh.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3


def test_unset_restores_dml(lh):
    lh.sql("ALTER TABLE t UNSET TBLPROPERTIES ('delta.appendOnly')")
    lh.sql("DELETE FROM t WHERE k = 1")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 1


def test_table_layer_gate(spark, tmp_path):
    t = ParquetTable.create(
        spark,
        str(tmp_path / "ao"),
        spark.createDataFrame([(1, 1)], "k int, v int"),
    )
    t.set_properties({"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="append-only"):
        t.delete("k = 1")
    with pytest.raises(ValueError, match="append-only"):
        t.update("k = 1", {"v": F.lit(0)})
    with pytest.raises(ValueError, match="append-only"):
        t.overwrite(spark.createDataFrame([(2, 2)], "k int, v int"))
    t.append(spark.createDataFrame([(2, 2)], "k int, v int"))  # allowed
    assert t.read().count() == 2
