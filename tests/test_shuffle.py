"""Deterministic shuffle: layout-independence (the property that makes
replay possible on a different cluster), permutation quality, epoch
separation."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.shuffle import (
    deterministic_shuffle,
)


def _ids(spark, n, input_parts):
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), (F.col("id") * 7).alias("payload"))
        .repartition(input_parts)
    )


def _sequence(df):
    """(partition, position) -> doc_id, the order a sequential reader sees."""
    rows = df.withColumn("_p", F.spark_partition_id()).collect()
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["_p"], []).append(r["doc_id"])
    return by_part


def test_same_permutation_regardless_of_input_layout(spark):
    a = _sequence(deterministic_shuffle(_ids(spark, 500, 3), seed=7, num_partitions=4))
    b = _sequence(deterministic_shuffle(_ids(spark, 500, 11), seed=7, num_partitions=4))
    assert a == b


def test_permutation_is_complete_and_actually_shuffled(spark):
    out = deterministic_shuffle(_ids(spark, 1000, 5), seed=1, num_partitions=4)
    seq = [d for p in sorted(_sequence(out)) for d in _sequence(out)[p]]
    assert sorted(seq) == list(range(1000))  # a permutation: nothing lost
    assert seq != list(range(1000))  # and not the identity
    # no long sorted runs survive (crude randomness check)
    longest = run = 1
    for x, y in zip(seq, seq[1:]):
        run = run + 1 if y == x + 1 else 1
        longest = max(longest, run)
    assert longest < 10


def test_epochs_give_different_permutations(spark):
    e0 = _sequence(deterministic_shuffle(_ids(spark, 300, 4), seed=0, num_partitions=4))
    e1 = _sequence(deterministic_shuffle(_ids(spark, 300, 4), seed=1, num_partitions=4))
    assert e0 != e1


def test_payload_travels_with_the_row(spark):
    out = deterministic_shuffle(_ids(spark, 100, 3), seed=3, num_partitions=2)
    assert all(r["payload"] == r["doc_id"] * 7 for r in out.collect())
    assert "_shuffle_key" not in out.columns
