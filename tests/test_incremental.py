"""Incremental aggregate maintenance: the refreshed table must equal a
from-scratch recompute after any mix of base DML, at CDF cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.incremental import (
    refresh_sum_aggregate,
)
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

_SCHEMA = "k string, v long, id long"


def _agg_of(df):
    return {
        r["k"]: (r["v"], r["n_rows"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("v"), F.count(F.lit(1)).alias("n_rows")
        ).collect()
    }


def _read_agg(spark, root):
    return {
        r["k"]: (r["v"], r["n_rows"])
        for r in ParquetTable.for_path(spark, root).read().collect()
    }


def test_refresh_tracks_base_through_dml(spark, tmp_path):
    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2), ("b", 5, 3)], _SCHEMA
        ),
    )
    v = refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"]
    )
    assert _read_agg(spark, agg_root) == {"a": (30, 2), "b": (5, 1)}

    # idempotent: nothing new -> same watermark, no new agg version
    agg_v = ParquetTable.for_path(spark, agg_root).latest_version()
    assert refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"]
    ) == v
    assert ParquetTable.for_path(spark, agg_root).latest_version() == agg_v

    # append + delete + update, then one incremental refresh
    base.append(
        spark.createDataFrame([("b", 7, 4), ("c", 100, 5)], _SCHEMA)
    )
    base.delete(F.col("id") == 1)          # a loses (10, 1 row)
    base.update(F.col("id") == 3, {"v": F.lit(50)})  # b: 5 -> 50
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    assert _read_agg(spark, agg_root) == _agg_of(base.read())
    assert _read_agg(spark, agg_root) == {
        "a": (20, 1),
        "b": (57, 2),
        "c": (100, 1),
    }

    # a group deleted to zero rows disappears from the aggregate
    base.delete(F.col("k") == "c")
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    assert "c" not in _read_agg(spark, agg_root)
    assert _read_agg(spark, agg_root) == _agg_of(base.read())


def test_refresh_recovers_from_unstamped_table(spark, tmp_path):
    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame([("a", 1, 1)], _SCHEMA),
    )
    # simulate the half-created crash state: table exists, no watermark
    ParquetTable.create(
        spark, agg_root, spark.createDataFrame([("junk", 0, 0)], _SCHEMA)
    )
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    assert _read_agg(spark, agg_root) == {"a": (1, 1)}
