"""Production IVF tests: deterministic k-means training, cluster
recovery, probed-search recall vs brute force, input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.ann import (
    build_ivf,
    ivf_search,
    train_kmeans,
)


def _clustered(spark, n_per=20, dim=8):
    # 3 well-separated clusters at (0...), (10...), (20...) plus jitter
    rows = []
    vid = 0
    for c, base in enumerate((0.0, 10.0, 20.0)):
        for i in range(n_per):
            vid += 1
            vec = [base + ((vid * 7 + j * 3) % 5) * 0.1 for j in range(dim)]
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id bigint, emb array<double>")


def test_kmeans_deterministic_and_recovers_clusters(spark):
    vecs = _clustered(spark)
    c1 = train_kmeans(vecs, k=3, n_iter=4)
    c2 = train_kmeans(vecs, k=3, n_iter=4)
    assert c1 == c2  # reproducible index builds
    # each centroid sits near one of the true cluster centers
    firsts = sorted(round(c[1][0] / 10) * 10 for c in c1)
    assert firsts == [0, 10, 20]


def test_kmeans_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id bigint, emb array<double>")
    with pytest.raises(ValueError, match="no rows"):
        train_kmeans(empty, k=3)


def test_kmeans_too_few_distinct_vectors_raises(spark):
    # 5 rows but only 2 distinct vectors < k=3
    dup = spark.createDataFrame(
        [(i, [float(i % 2), 0.0]) for i in range(5)],
        "vec_id bigint, emb array<double>",
    )
    with pytest.raises(ValueError, match="distinct"):
        train_kmeans(dup, k=3)


def test_ivf_assignment_is_pure(spark):
    vecs = _clustered(spark)
    cents = train_kmeans(vecs, k=3, n_iter=4)
    index = build_ivf(vecs, cents)
    # every vector lands in exactly one cell; cluster-mates share cells
    assert index.count() == vecs.count()
    n_cells = index.select("cell").distinct().count()
    assert n_cells == 3
    spread = index.groupBy("cell").count().select(F.min("count")).first()[0]
    assert spread == 20  # perfect 3-way split of the separated clusters


def test_ivf_search_matches_bruteforce_top1(spark):
    vecs = _clustered(spark)
    cents = train_kmeans(vecs, k=3, n_iter=4)
    index = build_ivf(vecs, cents)
    queries = vecs.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    got = ivf_search(index, queries, cents, top_k=1, n_probe=1)
    # brute force the same top-1
    a, b = vecs.alias("a"), vecs.alias("b")
    d = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    brute = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .filter(F.col("a.vec_id") % 10 == 0)
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            d.alias("d"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
    )
    got_map = {r["query_id"]: r["neighbor_id"] for r in got.collect()}
    brute_map = {r["query_id"]: r["neighbor_id"] for r in brute.collect()}
    # in-cluster queries: probing 1 trained cell recovers the exact top-1
    assert got_map == brute_map


# -- k-means|| (distributed seeding) -----------------------------------------


def test_kmeans_parallel_recovers_clusters(spark):
    from azure_databricks_lakehouse_spark.operators.ann import (
        train_kmeans_parallel,
    )

    vecs = _clustered(spark)
    cents = train_kmeans_parallel(vecs, k=3, seed_rounds=4, n_iter=4)
    assert len(cents) == 3
    # same recovery bar as the driver-sampled trainer: the 3 planted
    # clusters map to 3 distinct cells
    assigned = build_ivf(vecs, cents)
    # fixture ids are 1..60 in three planted groups of 20
    by_cluster: dict[int, set[int]] = {}
    for r in assigned.collect():
        by_cluster.setdefault((r["vec_id"] - 1) // 20, set()).add(r["cell"])
    assert all(len(cells) == 1 for cells in by_cluster.values())
    assert len({next(iter(s)) for s in by_cluster.values()}) == 3


def test_kmeans_parallel_deterministic(spark):
    from azure_databricks_lakehouse_spark.operators.ann import (
        train_kmeans_parallel,
    )

    vecs = _clustered(spark)
    a = train_kmeans_parallel(vecs, k=3, seed_rounds=3, n_iter=3)
    b = train_kmeans_parallel(vecs, k=3, seed_rounds=3, n_iter=3)
    assert a == b


def test_kmeans_parallel_validates_input(spark):
    from azure_databricks_lakehouse_spark.operators.ann import (
        train_kmeans_parallel,
    )

    empty = spark.createDataFrame([], "vec_id bigint, emb array<double>")
    with pytest.raises(ValueError, match="no rows"):
        train_kmeans_parallel(empty, k=3)
    dup = spark.createDataFrame(
        [(i, [float(i % 2), 0.0]) for i in range(6)],
        "vec_id bigint, emb array<double>",
    )
    with pytest.raises(ValueError, match="distinct"):
        train_kmeans_parallel(dup, k=3)


# --- persisted index: build once, probe many, read only probed cells -------
def test_persisted_ivf_matches_in_memory_search(spark, tmp_path):
    from azure_databricks_lakehouse_spark.operators.ann import (
        ivf_search_persisted,
        load_ivf_centroids,
        save_ivf_index,
    )

    vecs = _clustered(spark)
    root = str(tmp_path / "ivf")
    save_ivf_index(vecs, root, k=3, n_iter=4)

    queries = vecs.filter(F.col("vec_id").isin([1, 25, 45])).select(
        F.col("vec_id").alias("query_id"), F.col("emb")
    )
    got = ivf_search_persisted(
        spark, root, queries, top_k=3, n_probe=1
    )

    cents = load_ivf_centroids(spark, root)
    index = build_ivf(vecs, cents)
    want = ivf_search(index, queries, cents, top_k=3, n_probe=1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_persisted_ivf_prunes_unprobed_cells(spark, tmp_path):
    from azure_databricks_lakehouse_spark.operators.ann import (
        ivf_search_persisted,
        save_ivf_index,
    )
    from azure_databricks_lakehouse_spark.plans import physical_plan

    vecs = _clustered(spark)
    root = str(tmp_path / "ivf")
    save_ivf_index(vecs, root, k=3, n_iter=4)

    # one query, one probe -> exactly one of three cell partitions read
    queries = vecs.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("emb")
    )
    res = ivf_search_persisted(spark, root, queries, top_k=3, n_probe=1)
    plan = physical_plan(res)
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "cell" in m[0]  # the isin reached the scan's partition filters
    assert res.count() == 3
