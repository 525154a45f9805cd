"""Bucketed co-located joins: the shuffle-elimination pattern for repeated
large-table joins at 100 TB.

Two tables bucketed into the same number of buckets on the join key join
WITHOUT any Exchange — each task reads matching bucket files from both
sides.  This is the storage-layout investment that pays back on every
subsequent join/aggregate over the key (SURVEY.md §4 shuffle discipline;
the reference's Z-ORDER guidance is the read-side half of the same idea).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.plans import physical_plan


@pytest.fixture()
def tables(spark):
    suffix = uuid.uuid4().hex[:8]
    fact, dim = f"fact_{suffix}", f"dim_{suffix}"
    spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).write.bucketBy(8, "k").sortBy("k").saveAsTable(fact)
    spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    ).write.bucketBy(8, "k").sortBy("k").saveAsTable(dim)
    yield fact, dim
    spark.sql(f"DROP TABLE IF EXISTS {fact}")
    spark.sql(f"DROP TABLE IF EXISTS {dim}")


def test_bucketed_join_has_no_shuffle(spark, tables):
    fact, dim = tables
    # disable auto-broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(fact).join(spark.table(dim), "k")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_shuffles_for_contrast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000).select(F.col("id").alias("k"))
        b = spark.range(0, 10_000).select(F.col("id").alias("k"))
        plan = physical_plan(a.join(b, "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_avoids_shuffle(spark, tables):
    fact, _ = tables
    plan = physical_plan(spark.table(fact).groupBy("k").agg(F.sum("v")))
    assert "Exchange" not in plan  # aggregation key == bucket key
