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


def test_refresh_null_group_keys_stay_one_group(spark, tmp_path):
    """groupBy treats NULL as one group; the incremental merge must too
    (a plain equi-join never matches NULL keys and would fork the NULL
    group into extra rows on every refresh)."""
    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame([(None, 10, 1), ("a", 1, 2)], _SCHEMA),
    )
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    # two refreshes with NULL-group deltas: the historical failure mode
    # splits the NULL group on the first and compounds on the second
    base.append(spark.createDataFrame([(None, 5, 3)], _SCHEMA))
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    base.append(spark.createDataFrame([(None, 2, 4)], _SCHEMA))
    base.delete(F.col("id") == 1)
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    rows = ParquetTable.for_path(spark, agg_root).read().collect()
    assert len(rows) == 2  # exactly one NULL-group row survives
    assert _read_agg(spark, agg_root) == _agg_of(base.read())
    assert _read_agg(spark, agg_root)[None] == (7, 2)


def _read_extrema(spark, root):
    tbl = ParquetTable.for_path(spark, root)
    rows = {
        r["k"]: (r["v"], r["min_v"], r["max_v"], r["n_rows"])
        for r in tbl.read().collect()
    }
    return rows, tbl.properties().get("incremental_last_rescan_groups")


def _recompute_extrema(df):
    return {
        r["k"]: (r["v"], r["min_v"], r["max_v"], r["n_rows"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }


def test_refresh_min_max_with_retraction_rescan(spark, tmp_path):
    """MIN/MAX maintenance: inserts tighten algebraically; a delete that
    removes a group's extremum triggers a rescan of ONLY that group
    (count recorded in the commit props as evidence)."""
    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2), ("a", 15, 3), ("b", 5, 4), ("b", 9, 5)],
            _SCHEMA,
        ),
    )
    kw = dict(group_cols=["k"], sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    refresh_sum_aggregate(base, agg_root, **kw)
    rows, _ = _read_extrema(spark, agg_root)
    assert rows == _recompute_extrema(base.read())
    assert rows["a"] == (45, 10, 20, 3)

    # insert-only delta: extrema maintained algebraically, zero rescans
    base.append(spark.createDataFrame([("a", 25, 6), ("b", 1, 7)], _SCHEMA))
    refresh_sum_aggregate(base, agg_root, **kw)
    rows, n_rescan = _read_extrema(spark, agg_root)
    assert n_rescan == 0
    assert rows == _recompute_extrema(base.read())
    assert rows["a"] == (70, 10, 25, 4) and rows["b"] == (15, 1, 9, 3)

    # delete a NON-extremum row: still no rescan (15 is interior to a)
    base.delete(F.col("id") == 3)
    refresh_sum_aggregate(base, agg_root, **kw)
    rows, n_rescan = _read_extrema(spark, agg_root)
    assert n_rescan == 0
    assert rows == _recompute_extrema(base.read())

    # delete group a's MAX (25): only a rescans; b's row is untouched
    base.delete(F.col("id") == 6)
    refresh_sum_aggregate(base, agg_root, **kw)
    rows, n_rescan = _read_extrema(spark, agg_root)
    assert n_rescan == 1
    assert rows == _recompute_extrema(base.read())
    assert rows["a"] == (30, 10, 20, 2)
    assert rows["b"] == (15, 1, 9, 3)

    # UPDATE that moves a group's min (delete+insert pair in the CDF):
    # b's min row 1 -> 50, so b must rescan and recover min=5
    base.update(F.col("id") == 7, {"v": F.lit(50)})
    refresh_sum_aggregate(base, agg_root, **kw)
    rows, n_rescan = _read_extrema(spark, agg_root)
    assert n_rescan == 1
    assert rows == _recompute_extrema(base.read())
    assert rows["b"] == (64, 5, 50, 3)


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


def test_refresh_tracks_merge_on_read_deletes(spark, tmp_path):
    """A deletion-vector DELETE never rewrites a data file, but its CDC
    sidecar still carries the exact retraction — the incremental refresh
    must subtract it like any copy-on-write delete."""
    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2), ("b", 5, 3), ("b", 7, 4)], _SCHEMA
        ).coalesce(1),  # one shared file so the delete takes the DV path
    )
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    files_before = list(base._manifest()["files"])
    base.delete("id = 2", mode="merge-on-read")
    assert base._manifest()["files"] == files_before  # DV, not rewrite
    refresh_sum_aggregate(base, agg_root, group_cols=["k"], sum_cols=["v"])
    assert _read_agg(spark, agg_root) == _agg_of(base.read())
    assert _read_agg(spark, agg_root) == {"a": (10, 1), "b": (12, 2)}


def _nd_of(spark, root):
    return {
        r["k"]: r["nd_id"]
        for r in ParquetTable.for_path(spark, root).read().collect()
    }


def test_distinct_counts_sketch_merge_on_append_only(spark, tmp_path):
    """Append-only refresh maintains nd_<c> via hll_union of the
    inserted values' sketch — the exact sketch-merge path: ZERO rescan
    groups recorded, and the estimate matches the exact distinct count
    (HLL is exact at these cardinalities)."""
    from azure_databricks_lakehouse_spark.operators.incremental import (
        _LAST_RESCAN,
    )

    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame(
            [("a", 1, 1), ("a", 1, 2), ("a", 2, 3), ("b", 3, 4)], _SCHEMA
        ),
    )
    refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"],
        distinct_cols=["id"],
    )
    assert _nd_of(spark, agg_root) == {"a": 3, "b": 1}
    # two appends: new ids, one repeated id (distinct count must not
    # double-count id=2 for group a)
    base.append(spark.createDataFrame([("a", 9, 2), ("a", 9, 7)], _SCHEMA))
    base.append(spark.createDataFrame([("b", 9, 8), ("c", 9, 9)], _SCHEMA))
    refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"],
        distinct_cols=["id"],
    )
    assert _nd_of(spark, agg_root) == {"a": 4, "b": 2, "c": 1}
    props = ParquetTable.for_path(spark, agg_root).properties()
    assert props[_LAST_RESCAN] == 0, "append-only must not rescan"


def test_distinct_counts_rescan_only_deleted_groups(spark, tmp_path):
    """Sketches cannot retract: a delete touching group 'a' forces a
    recompute of EXACTLY that group (audited via the rescan counter);
    untouched groups keep their merged sketches."""
    from azure_databricks_lakehouse_spark.operators.incremental import (
        _LAST_RESCAN,
    )

    base_root, agg_root = str(tmp_path / "base"), str(tmp_path / "agg")
    base = ParquetTable.create(
        spark,
        base_root,
        spark.createDataFrame(
            [("a", 1, 1), ("a", 1, 2), ("b", 3, 4), ("b", 3, 5), ("c", 1, 6)],
            _SCHEMA,
        ),
    )
    refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"],
        distinct_cols=["id"],
    )
    base.delete(F.col("id") == 1)  # group a only
    base.append(spark.createDataFrame([("c", 9, 7)], _SCHEMA))
    refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"],
        distinct_cols=["id"],
    )
    assert _nd_of(spark, agg_root) == {"a": 1, "b": 2, "c": 2}
    props = ParquetTable.for_path(spark, agg_root).properties()
    assert props[_LAST_RESCAN] == 1, "only the deleted group rescans"
    # a group deleted to zero rows disappears entirely
    base.delete(F.col("k") == "b")
    refresh_sum_aggregate(
        base, agg_root, group_cols=["k"], sum_cols=["v"],
        distinct_cols=["id"],
    )
    assert set(_nd_of(spark, agg_root)) == {"a", "c"}


def test_all_null_sum_group_stays_null_across_refreshes(spark, tmp_path):
    """SQL SUM over a group with no non-NULL values is NULL; before the
    per-sum non-null counters, the merge's coalesce(cur, 0) silently
    drifted such a group's stored NULL to 0 on the FIRST refresh that
    touched any other group (found while building the MV layer, which
    reconstructs the same semantics from its own hidden counters)."""
    from azure_databricks_lakehouse_spark.operators.incremental import (
        refresh_sum_aggregate,
    )
    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    base = ParquetTable.create(
        spark,
        str(tmp_path / "b"),
        spark.createDataFrame([(1, None), (2, 5)], "g int, x int"),
    )
    agg = str(tmp_path / "agg")
    refresh_sum_aggregate(base, agg, group_cols=["g"], sum_cols=["x"])
    t = ParquetTable.for_path(spark, agg)

    base.append(spark.createDataFrame([(2, 7)], "g int, x int"))
    refresh_sum_aggregate(base, agg, group_cols=["g"], sum_cols=["x"])
    got = {r.g: r.x for r in t.read().collect()}
    assert got == {1: None, 2: 12}

    # the NULL group becoming non-NULL and back again round-trips
    base.append(spark.createDataFrame([(1, 3)], "g int, x int"))
    refresh_sum_aggregate(base, agg, group_cols=["g"], sum_cols=["x"])
    assert {r.g: r.x for r in t.read().collect()}[1] == 3
    base.delete("g = 1 AND x = 3")
    refresh_sum_aggregate(base, agg, group_cols=["g"], sum_cols=["x"])
    assert {r.g: r.x for r in t.read().collect()}[1] is None
