"""Embedding-modality incremental dedup vs a persisted LSH index."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.embeddings import (
    dedup_embeddings_against_index,
    embedding_signatures,
    with_norm,
)
from azure_databricks_lakehouse_spark.plans import (
    assert_no_cartesian,
    physical_plan,
)


def _unit(seed: int, dim: int = 16) -> list[float]:
    # deterministic pseudo-random unit vector (hash-uniform coordinates
    # in [-1, 1) — sin-based phases alias between seeds)
    import hashlib

    raw = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{j}".encode()).digest()
        raw.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


def _corpus(spark, n=30):
    return spark.createDataFrame(
        [(i, _unit(i)) for i in range(n)], "vec_id long, emb array<double>"
    )


def test_signatures_are_per_band_and_shuffle_free(spark):
    vecs = _corpus(spark)
    sigs = embedding_signatures(vecs, bands=4, planes_per_band=8)
    assert sigs.count() == 30 * 4
    assert "Exchange" not in physical_plan(sigs)
    # deterministic across calls
    assert sorted(map(tuple, sigs.collect())) == sorted(
        map(tuple, embedding_signatures(vecs, bands=4, planes_per_band=8).collect())
    )


def test_batch_screen_catches_exact_and_near_copies(spark):
    corpus = _corpus(spark)
    sigs = embedding_signatures(corpus)
    vecs = with_norm(corpus)

    near = [x + 0.01 * y for x, y in zip(_unit(3), reversed(_unit(3)))]
    batch = spark.createDataFrame(
        [
            (100, _unit(7)),   # exact copy of corpus vec 7
            (101, near),       # near-copy of corpus vec 3 (cosine ~ 0.9999)
            (102, _unit(999)), # fresh
        ],
        "vec_id long, emb array<double>",
    )
    kept, rejected, new_sigs, new_vecs = dedup_embeddings_against_index(
        batch, sigs, vecs, min_cosine=0.99
    )
    rej = {r["vec_id"]: r for r in rejected.collect()}
    assert set(rej) == {100, 101}
    assert rej[100]["match_id"] == 7 and rej[100]["cosine"] > 0.9999
    assert rej[101]["match_id"] == 3
    assert [r["vec_id"] for r in kept.collect()] == [102]
    # only the kept vector extends the index
    assert {r["vec_id"] for r in new_sigs.collect()} == {102}
    assert {r["vec_id"] for r in new_vecs.collect()} == {102}

    # incremental property: appending the new rows catches the next copy
    _, rejected2, _, _ = dedup_embeddings_against_index(
        spark.createDataFrame(
            [(200, _unit(999))], "vec_id long, emb array<double>"
        ),
        sigs.unionByName(new_sigs),
        vecs.unionByName(new_vecs),
        min_cosine=0.99,
    )
    r2 = rejected2.collect()
    assert len(r2) == 1 and r2[0]["match_id"] == 102


def test_screen_plan_broadcasts_batch_and_never_cartesian(spark):
    corpus = _corpus(spark)
    sigs = embedding_signatures(corpus)
    vecs = with_norm(corpus)
    batch = spark.createDataFrame(
        [(100, _unit(7))], "vec_id long, emb array<double>"
    )
    _, rejected, _, _ = dedup_embeddings_against_index(batch, sigs, vecs)
    plan = physical_plan(rejected)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(rejected)


def test_zero_vectors_are_caught_not_skipped(spark):
    """NULL-cosine regression: zero-norm vectors must reject against an
    identical zero vector (cosine defined as 1), not slip through on a
    NULL comparison."""
    dim = 16
    corpus = spark.createDataFrame(
        [(1, _unit(1)), (2, [0.0] * dim)], "vec_id long, emb array<double>"
    )
    sigs = embedding_signatures(corpus)
    vecs = with_norm(corpus)
    batch = spark.createDataFrame(
        [(100, [0.0] * dim)], "vec_id long, emb array<double>"
    )
    kept, rejected, _, _ = dedup_embeddings_against_index(
        batch, sigs, vecs, min_cosine=0.99
    )
    r = rejected.collect()
    assert len(r) == 1 and r[0]["match_id"] == 2 and r[0]["cosine"] == 1.0
    assert kept.count() == 0
