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
