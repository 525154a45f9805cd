"""Generated columns (Delta GENERATED ALWAYS AS): writers may omit
them, expressions fill them, stored values are enforced to match, and
rows predating the column read through the expression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import (
    ConstraintViolationError,
    ParquetTable,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _table(spark, root):
    df = spark.range(20).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10).cast("double").alias("amount"),
    )
    return ParquetTable.create(spark, root, df)


def test_add_generated_column_is_retroactive(spark, root):
    t = _table(spark, root)
    before = list(t._manifest()["files"])
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    assert t._manifest()["files"] == before, "metadata-only"
    # rows written BEFORE the column read through the expression
    row = t.read().filter("k = 4").first()
    assert row["amount_eur"] == pytest.approx(36.0)
    # writers omit it; the table fills it in and persists it
    t.append(spark.createDataFrame([(100, 50.0)], "k int, amount double"))
    assert t.read().filter("k = 100").first()["amount_eur"] == pytest.approx(45.0)


def test_generated_value_is_enforced_on_write(spark, root):
    t = _table(spark, root)
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    with pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame(
                [(101, 50.0, 999.0)], "k int, amount double, amount_eur double"
            )
        )
    # a CORRECT explicit value passes
    t.append(
        spark.createDataFrame(
            [(101, 50.0, 45.0)], "k int, amount double, amount_eur double"
        )
    )
    assert t.read().filter("k = 101").count() == 1


def test_set_generated_validates_existing_data(spark, root):
    t = _table(spark, root)
    t.append(spark.createDataFrame([(99, -1.0)], "k int, amount double"))
    with pytest.raises(ConstraintViolationError):
        t.set_generated("amount", "abs(amount)")  # -1 != 1 -> reject
    # stored values that MATCH the expression register fine
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10).cast("double").alias("amount"),
        (F.col("id") * 9.0).cast("double").alias("amount_eur"),
    )
    t2 = ParquetTable.create(spark, root + "2", df)
    t2.set_generated("amount_eur", "amount * 0.9")
    assert t2.generated_columns() == {"amount_eur": "amount * 0.9"}
    # stored NULLs count as violations too (strictness: a NULL is not
    # "unmaterialized", it is a wrong stored value)
    t3 = _table(spark, root + "3")
    t3.add_column("sign", "int")
    with pytest.raises(ConstraintViolationError):
        t3.set_generated("sign", "CASE WHEN amount >= 0 THEN 1 ELSE -1 END")


def test_update_recomputes_generated(spark, root):
    t = _table(spark, root)
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    # copy-on-write path
    t.update("k = 3", {"amount": F.lit(200.0)}, mode="copy-on-write")
    row = t.read().filter("k = 3").first()
    assert row["amount"] == 200.0 and row["amount_eur"] == pytest.approx(180.0)
    # merge-on-read path (DV + appended post-image)
    t.update("k = 5", {"amount": F.lit(300.0)}, mode="merge-on-read")
    row = t.read().filter("k = 5").first()
    assert row["amount"] == 300.0 and row["amount_eur"] == pytest.approx(270.0)
    # untouched rows keep their derived values
    assert t.read().filter("k = 7").first()["amount_eur"] == pytest.approx(63.0)


def test_merge_fills_generated_for_omitting_source(spark, root):
    t = _table(spark, root)
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    t.merge(
        spark.createDataFrame([(3, 400.0), (200, 10.0)], "k int, amount double"),
        on=["k"],
    )
    assert t.read().filter("k = 3").first()["amount_eur"] == pytest.approx(360.0)
    assert t.read().filter("k = 200").first()["amount_eur"] == pytest.approx(9.0)


def test_generated_survives_rename_and_guards_sources(spark, root):
    t = _table(spark, root)
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    # renaming the SOURCE column of the expression must refuse
    with pytest.raises(ValueError, match="generated:amount_eur"):
        t.rename_column("amount", "amt")
    with pytest.raises(ValueError, match="generated:amount_eur"):
        t.drop_column("amount")
    # renaming the generated column itself re-keys the registry
    t.rename_column("amount_eur", "eur")
    assert "eur" in t.generated_columns()
    t.append(spark.createDataFrame([(300, 20.0)], "k int, amount double"))
    assert t.read().filter("k = 300").first()["eur"] == pytest.approx(18.0)
    # dropping the generated column removes the invariant
    t.drop_column("eur")
    assert t.generated_columns() == {}
    t.append(spark.createDataFrame([(301, 20.0)], "k int, amount double"))
    assert "eur" not in t.read().columns


def test_generated_column_queryable_in_dml_conditions(spark, root):
    t = _table(spark, root)
    t.add_generated_column("bucket", "int", "CAST(amount / 50 AS INT)")
    # DELETE over the derived value — old files compute it on the fly
    t.delete("bucket = 2")  # amounts 100..140 -> k 10..14
    assert t.read().count() == 15
    assert t.read().filter("k IN (10, 11, 12, 13, 14)").count() == 0


# -- column DEFAULT values (write-time fill, Delta ALTER COLUMN SET DEFAULT) --


def test_default_fills_omitted_column(spark, tmp_path):
    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    root = str(tmp_path / "tdef")
    t = ParquetTable.create(
        spark, root, spark.createDataFrame([(1, "us")], "k int, region string")
    )
    t.set_default("region", "'emea'")
    t.append(spark.createDataFrame([(2,)], "k int"))          # omitted -> default
    t.append(spark.createDataFrame([(3, None)], "k int, region string"))
    t.append(spark.createDataFrame([(4, "apac")], "k int, region string"))
    rows = {r["k"]: r["region"] for r in t.read().collect()}
    assert rows == {1: "us", 2: "emea", 3: None, 4: "apac"}, (
        "default applies ONLY when the column is absent; explicit NULL wins"
    )
    # history is untouched: version 0 still reads its original values
    assert {r["k"] for r in t.read(version=0).collect()} == {1}
    # drop: omitting writers go back to NULL
    t.drop_default("region")
    t.append(spark.createDataFrame([(5,)], "k int"))
    assert {r["k"]: r["region"] for r in t.read().collect()}[5] is None


def test_default_validation_and_restore(spark, tmp_path):
    import pytest

    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    root = str(tmp_path / "tdefv")
    t = ParquetTable.create(
        spark, root, spark.createDataFrame([(1, 10)], "k int, n int")
    )
    with pytest.raises(ValueError, match="constant"):
        t.set_default("n", "k + 1")      # row-dependent -> generated, not default
    with pytest.raises(ValueError, match="no such column"):
        t.set_default("missing", "1")
    v_before = t.set_default("n", "7")
    # a generated column may not ALSO take a default
    t2 = ParquetTable.create(
        spark,
        str(tmp_path / "tgen"),
        spark.createDataFrame([(1, 2)], "k int, twice int"),
    )
    t2.set_generated("twice", "k * 2")
    with pytest.raises(ValueError, match="generated"):
        t2.set_default("twice", "0")
    # RESTORE rolls the default registry back with the data
    t.restore(v_before - 1)
    t.append(spark.createDataFrame([(2,)], "k int"))
    assert {r["k"]: r["n"] for r in t.read().collect()}[2] is None


def test_update_where_in_recomputes_generated(spark, root):
    """update_where_in (the IN-subquery UPDATE rewrite) matches
    update()'s generated-column semantics: unassigned generated columns
    are recomputed over the post-update row, untouched rows keep
    theirs."""
    t = _table(spark, root)
    t.add_generated_column("amount_eur", "double", "amount * 0.9")
    keys = spark.createDataFrame([(3,), (5,)], "k int")
    t.update_where_in("k", keys, {"amount": F.lit(200.0)})
    got = {r["k"]: r["amount_eur"] for r in t.read().collect()}
    assert got[3] == pytest.approx(180.0) and got[5] == pytest.approx(180.0)
    assert got[7] == pytest.approx(63.0)
