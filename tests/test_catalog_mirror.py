"""Catalog mirrors feed Spark's own CBO (round-9 verdict item 8).

Temp views can never carry CatalogStatistics, so plain ``spark.sql``
users were limited to the registration-time broadcast hints.
``Lakehouse.mirror_to_catalog`` registers a snapshot as a REAL catalog
table over a hardlinked (zero-copy) file layout and runs Spark's own
ANALYZE — after which ``spark.sql`` gets rowCount-driven sizing and,
with ``spark.sql.cbo.joinReorder.enabled``, genuine join REORDERING.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def cbo_conf(spark):
    keys = ["spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled"]
    old = {k: spark.conf.get(k) for k in keys}
    for k in keys:
        spark.conf.set(k, "true")
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def _rel_order(spark, q: str) -> list[str]:
    plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    seen: list[str] = []
    for n in re.findall(r"\w+_mirror", plan):
        if n not in seen:
            seen.append(n)
    return seen


def test_mirror_rows_match_and_partitioned_discovery(spark, lh):
    lh.sql(
        "CREATE TABLE pf PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 3 AS INT) AS p FROM range(300)"
    )
    ct = lh.mirror_to_catalog("pf")
    assert ct == "pf_mirror"
    assert spark.sql(f"SELECT COUNT(*) FROM {ct}").first()[0] == 300
    got = spark.sql(
        f"SELECT p, COUNT(*) AS n FROM {ct} GROUP BY p ORDER BY p"
    ).collect()
    assert [(r.p, r.n) for r in got] == [(0, 100), (1, 100), (2, 100)]
    spark.sql(f"DROP TABLE IF EXISTS {ct}")


def test_mirror_is_zero_copy_hardlinks(spark, lh, tmp_path):
    lh.sql("CREATE TABLE zc AS SELECT id AS k FROM range(100)")
    t = lh.table("zc")
    path = t.snapshot_link_dir()
    files = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files and all(os.stat(f).st_nlink >= 2 for f in files)
    # idempotent: same version returns the same dir
    assert t.snapshot_link_dir() == path


def test_mirror_refuses_dv_and_colmap_snapshots(spark, lh):
    lh.sql("CREATE TABLE dv AS SELECT id AS k FROM range(100)")
    t = lh.table("dv")
    t.delete("k = 3", mode="merge-on-read")
    with pytest.raises(ValueError, match="deletion vectors"):
        lh.mirror_to_catalog("dv")


def test_catalog_stats_give_rowcount_to_plain_spark_sql(
    spark, lh, cbo_conf
):
    lh.sql("CREATE TABLE rc AS SELECT id AS k FROM range(1234)")
    ct = lh.mirror_to_catalog("rc")
    stats = (
        spark.sql(f"SELECT * FROM {ct}")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .toString()
    )
    assert "rowCount=" in stats, stats  # rendered scientific, e.g. 1.23E+3
    spark.sql(f"DROP TABLE IF EXISTS {ct}")


def test_three_table_join_reorders_with_stats_not_without(
    spark, lh, cbo_conf
):
    """The done-criterion: a 3-table plain-spark.sql join written in a
    bad order (big JOIN big JOIN tiny) keeps the user's order without
    statistics and pulls the tiny dim forward once the mirrors are
    ANALYZEd — Catalyst's CostBasedJoinReorder consuming OUR mirrors'
    stats."""
    lh.sql("CREATE TABLE big1 AS SELECT id AS k, id % 5 AS g FROM range(50000)")
    lh.sql("CREATE TABLE big2 AS SELECT id AS k, id % 9 AS h FROM range(50000)")
    lh.sql("CREATE TABLE tiny AS SELECT id AS g, CONCAT('t', id) AS name FROM range(2)")
    q = (
        "SELECT b1.k, t.name FROM big1_mirror b1 "
        "JOIN big2_mirror b2 ON b1.k = b2.k "
        "JOIN tiny_mirror t ON b1.g = t.g"
    )
    cols = {"big1": ["k", "g"], "big2": ["k"], "tiny": ["g"]}
    for n in ("big1", "big2", "tiny"):
        lh.mirror_to_catalog(n, analyze=False)
    assert _rel_order(spark, q) == [
        "big1_mirror",
        "big2_mirror",
        "tiny_mirror",
    ]
    for n in ("big1", "big2", "tiny"):
        lh.mirror_to_catalog(n, columns=cols[n])
    assert _rel_order(spark, q) == [
        "big1_mirror",
        "tiny_mirror",
        "big2_mirror",
    ]
    # the reordered plan returns the same rows (g in {0,1} keeps 2/5)
    assert spark.sql(q).count() == 20000
    for n in ("big1", "big2", "tiny"):
        spark.sql(f"DROP TABLE IF EXISTS {n}_mirror")


def test_mirror_refresh_tracks_new_snapshot(spark, lh):
    lh.sql("CREATE TABLE mr AS SELECT id AS k FROM range(10)")
    ct = lh.mirror_to_catalog("mr")
    assert spark.sql(f"SELECT COUNT(*) FROM {ct}").first()[0] == 10
    lh.sql("INSERT INTO mr VALUES (99)")
    # the mirror is a snapshot: stale until refreshed
    lh.mirror_to_catalog("mr")
    assert spark.sql(f"SELECT COUNT(*) FROM {ct}").first()[0] == 11
    spark.sql(f"DROP TABLE IF EXISTS {ct}")
