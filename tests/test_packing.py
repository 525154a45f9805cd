"""Distributed prefix-sum + packing manifest tests: exact offsets under
many partitions, spanning documents, capacity boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.packing import (
    distributed_cumsum,
    pack_manifest,
)


def test_cumsum_matches_serial_under_partitioning(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13 + 1).alias("v")
    ).repartition(8)
    got = {
        r["k"]: r["cumsum"]
        for r in distributed_cumsum(df, "v", "k").collect()
    }
    acc, want = 0, {}
    for k in range(500):
        want[k] = acc
        acc += (k * 7) % 13 + 1
    assert got == want


def test_pack_manifest_boundaries(spark):
    # capacity 10: docs of 4,4,4 -> third doc straddles seqs 0 and 1
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 9), (5, 25)], "doc_id int, n_tokens int"
    )
    rows = {
        r["doc_id"]: (
            r["start_offset"], r["start_seq"], r["end_seq"], r["offset_in_seq"]
        )
        for r in pack_manifest(df, capacity=10).collect()
    }
    assert rows[1] == (0, 0, 0, 0)
    assert rows[2] == (4, 0, 0, 4)
    assert rows[3] == (8, 0, 1, 8)     # spans the 10-token boundary
    assert rows[4] == (12, 1, 2, 2)
    assert rows[5] == (21, 2, 4, 1)    # long doc spans three sequences
