"""JDBC source/sink round-trip against the Derby embedded engine that
ships inside Spark's own jars — a REAL database over a real JDBC driver,
no external service.  Covers the S12 'databases' ingestion modality the
reference documents (README.md:20)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    jdbc_driver_available,
    read_jdbc,
    write_jdbc,
)


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not jdbc_driver_available(spark, DERBY_EMBEDDED_DRIVER):
        pytest.skip("Derby embedded driver not on the Spark classpath")
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_round_trip(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(1, 51)],
        "id int, name string, amount int",
    )
    write_jdbc(df, derby_url, "accounts", mode="overwrite")
    back = read_jdbc(spark, derby_url, "accounts")
    assert back.count() == 50
    assert {r["id"]: r["amount"] for r in back.collect()} == {
        i: i * 10 for i in range(1, 51)
    }


def test_jdbc_partitioned_read_and_pushdown(spark, derby_url):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(1, 101)], "id int, bucket int"
    )
    write_jdbc(df, derby_url, "events_jdbc", mode="overwrite")
    part = read_jdbc(
        spark,
        derby_url,
        "events_jdbc",
        partition_column="id",
        lower_bound=1,
        upper_bound=100,
        num_partitions=4,
    )
    # 4 range queries = 4 input partitions, no rows lost or duplicated
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 100
    # filter pushdown: the JDBC scan carries the predicate remotely
    filtered = part.filter(F.col("bucket") == 3)
    assert filtered.count() == 20
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bucket" in plan


def test_jdbc_partition_args_must_come_together(spark, derby_url):
    with pytest.raises(ValueError, match="together"):
        read_jdbc(spark, derby_url, "t", partition_column="id")
