"""CONVERT TO DELTA parity: in-place adoption of a plain parquet
directory — no data rewrite, stats collected, full table features
available immediately after."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


def _plain_parquet(spark, path, partitioned=True):
    df = spark.range(40).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    w = df.write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("part")
    w.parquet(path)
    return df


def _data_files(path):
    out = {}
    for dirpath, dirs, fnames in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_")]  # manifest/sidecars
        for fn in fnames:
            if fn.endswith(".parquet"):
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                out[fn] = (st.st_size, st.st_mtime_ns)
    return out


def test_convert_adopts_without_rewrite(spark, tmp_path):
    path = str(tmp_path / "plain")
    df = _plain_parquet(spark, path)
    before = _data_files(path)
    t = ParquetTable.convert(spark, path, partition_by=["part string"])
    after = _data_files(path)
    # same file bytes, same mtimes — renamed, never rewritten (names
    # gain the commit prefix)
    strip = lambda n: n.split("-", 1)[1]  # noqa: E731
    assert {strip(n): v for n, v in after.items()} == before
    # content identical through the table read
    got = sorted((r["k"], r["part"], r["v"]) for r in t.read().collect())
    want = sorted((r["k"], r["part"], r["v"]) for r in df.collect())
    assert got == want
    assert t.history()[-1].operation == "CONVERT"
    # partition pruning works off the adopted layout + collected stats
    assert t.read().filter(F.col("part") == "2").count() == 10


def test_converted_table_supports_dml_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "plain2")
    _plain_parquet(spark, path)
    t = ParquetTable.convert(spark, path, partition_by=["part string"])
    t.delete("part = '1' AND k = 1")
    assert t.read().filter("k = 1").count() == 0
    assert t.read(version=0).filter("k = 1").count() == 1
    t.append(spark.createDataFrame([(100, "0", "x")], "k int, part string, v string"))
    assert t.read().count() == 40  # 40 - 1 + 1


def test_convert_validation(spark, tmp_path):
    path = str(tmp_path / "plain3")
    _plain_parquet(spark, path)
    # wrong declared partitioning: refuse BEFORE moving anything
    before = _data_files(path)
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        ParquetTable.convert(spark, path, partition_by=["wrong"])
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        ParquetTable.convert(spark, path)  # layout is partitioned
    assert _data_files(path) == before, "failed convert must not move files"
    t = ParquetTable.convert(spark, path, partition_by=["part"])
    with pytest.raises(FileExistsError):
        ParquetTable.convert(spark, path, partition_by=["part"])
    # empty dir
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        ParquetTable.convert(spark, empty)


def test_convert_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = _plain_parquet(spark, path, partitioned=False)
    t = ParquetTable.convert(spark, path)
    assert t.read().count() == df.count()
    assert sorted(r["k"] for r in t.read().collect()) == list(range(40))


def test_partition_column_keeps_declared_type(spark, tmp_path):
    """Regression (found via CONVERT, latent for every table): a STRING
    partition column with numeric-looking values must read back as
    string — partition-value inference used to silently return int,
    diverging from the manifest schema."""
    root = str(tmp_path / "ptype")
    df = spark.createDataFrame([(1, "0"), (2, "1")], "k int, part string")
    t = ParquetTable.create(spark, root, df, partition_by=["part"])
    assert dict(t.read().dtypes)["part"] == "string"
    assert sorted(r["part"] for r in t.read().collect()) == ["0", "1"]
    # and DML through the typed column behaves
    t.delete("part = '0'")
    assert [r["part"] for r in t.read().collect()] == ["1"]
