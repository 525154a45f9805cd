"""Incremental HLL distinct counting: slice-built sketches union to the
same answer as a direct global distinct, without re-reading facts."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.sketches import (
    build_sketches,
    merge_sketches,
)


def _facts(spark, lo, hi):
    # users overlap across slices: user_id = id % 500
    return spark.range(lo, hi).select(
        (F.col("id") % 500).alias("user_id"),
        (F.col("id") % 3).alias("region"),
        F.floor(F.col("id") / 4000).alias("day"),
    )


def test_incremental_sketches_match_direct_distinct(spark):
    # ingest two slices independently — sketch table is the union of both
    s1 = build_sketches(_facts(spark, 0, 4000), "user_id", ["day", "region"])
    s2 = build_sketches(_facts(spark, 4000, 8000), "user_id", ["day", "region"])
    sketch_table = s1.unionByName(s2)

    # global rollup over the sketch table only
    est = merge_sketches(sketch_table).first()["n_distinct"]
    true = (
        _facts(spark, 0, 8000).select("user_id").distinct().count()
    )
    assert true == 500
    assert abs(est - true) / true < 0.05  # ~1.6% expected at lgK=12

    # per-region rollup from the SAME sketch rows
    per_region = {
        r["region"]: r["n_distinct"]
        for r in merge_sketches(sketch_table, ["region"]).collect()
    }
    for region in (0, 1, 2):
        true_r = (
            _facts(spark, 0, 8000)
            .filter(F.col("region") == region)
            .select("user_id")
            .distinct()
            .count()
        )
        assert abs(per_region[region] - true_r) / true_r < 0.05


def test_sketch_rows_are_small(spark):
    s = build_sketches(_facts(spark, 0, 8000), "user_id", ["day"])
    max_bytes = s.select(F.max(F.length("sketch")).alias("m")).first()["m"]
    assert max_bytes < 8192  # KB-scale rows no matter the cardinality
