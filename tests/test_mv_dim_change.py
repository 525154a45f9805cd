"""Dim-change incremental maintenance for star-join materialized
views (round 12).

A grouped MV over an INNER star join maintains under DIM movement by
the bilinear telescoping

    Δ(F⋈D1⋈D2) = ΔF⋈D1ᵒ⋈D2ᵒ + Fⁿ⋈ΔD1⋈D2ᵒ + Fⁿ⋈D1ⁿ⋈ΔD2

— each leg joins ONE delta slice (fact CDF, or a dim's CDF between
its pinned and current version) against snapshots and feeds the same
signed-weight fold as a fact-only delta.  The commit re-pins
``mv_dep_dims`` atomically with the folded state.

Done-criterion: after ANY mix of fact and dim DML, incremental
refresh leaves the MV row-identical to recomputing the defining
query; LEFT joins and unpinned/VACUUMed dims still fall back to full.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _mk(lh):
    lh.sql(
        "CREATE TABLE f AS SELECT col1 AS k, col2 AS x FROM VALUES "
        "(1, 10), (1, 5), (2, 7), (3, 1), (9, 100)"
    )
    lh.sql(
        "CREATE TABLE d AS SELECT col1 AS k, col2 AS seg FROM VALUES "
        "(1, 'a'), (2, 'a'), (3, 'b')"
    )


_Q = (
    "SELECT d.seg AS seg, SUM(f.x) AS sx, COUNT(*) AS n "
    "FROM f JOIN d ON f.k = d.k GROUP BY d.seg"
)


def _rows(lh, q):
    return sorted((tuple(r) for r in lh.sql(q).collect()), key=str)


def test_dim_update_folds_incrementally(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    # move rows between groups and change a non-key attribute
    lh.sql("UPDATE d SET seg = 'b' WHERE k = 1")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM m") == _rows(lh, _Q)
    # the commit re-pinned the dim: an immediate second refresh noops
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "noop"


def test_dim_insert_and_delete_change_matchedness(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    # k=9 facts were INNER-unmatched; inserting their dim row admits
    # them, deleting d.k=3 kills group 'b'
    lh.sql("INSERT INTO d VALUES (9, 'c')")
    lh.sql("DELETE FROM d WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM m") == _rows(lh, _Q)


def test_fact_and_dim_dml_in_one_window(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    lh.sql("INSERT INTO f VALUES (2, 40), (3, 3)")
    lh.sql("UPDATE d SET seg = 'c' WHERE k = 2")
    lh.sql("DELETE FROM f WHERE k = 1 AND x = 5")
    lh.sql("UPDATE f SET x = x + 1 WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM m") == _rows(lh, _Q)


def test_two_moved_dims_compose(lh):
    _mk(lh)
    lh.sql(
        "CREATE TABLE d2 AS SELECT col1 AS k, col2 AS z FROM VALUES "
        "(1, 'p'), (2, 'q'), (3, 'p')"
    )
    q = (
        "SELECT d.seg AS seg, d2.z AS z, SUM(f.x) AS sx "
        "FROM f JOIN d ON f.k = d.k JOIN d2 ON f.k = d2.k "
        "GROUP BY d.seg, d2.z"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW m2 AS {q}")
    lh.sql("UPDATE d SET seg = 'b' WHERE k = 2")
    lh.sql("UPDATE d2 SET z = 'r' WHERE k = 3")
    lh.sql("INSERT INTO f VALUES (2, 11)")
    r = lh.sql("REFRESH MATERIALIZED VIEW m2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM m2") == _rows(lh, q)


def test_extrema_with_dim_change_rescan(lh):
    _mk(lh)
    q = (
        "SELECT d.seg AS seg, MAX(f.x) AS mx, COUNT(*) AS n "
        "FROM f JOIN d ON f.k = d.k GROUP BY d.seg"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW mx AS {q}")
    # moving k=1 (holder of max 10 in 'a') retracts that extremum
    lh.sql("UPDATE d SET seg = 'b' WHERE k = 1")
    r = lh.sql("REFRESH MATERIALIZED VIEW mx").collect()[0]
    assert r.mode in ("incremental", "incremental_rescan")
    assert _rows(lh, "SELECT * FROM mx") == _rows(lh, q)


def test_left_join_dim_change_is_full(lh):
    _mk(lh)
    q = (
        "SELECT d.seg AS seg, SUM(f.x) AS sx "
        "FROM f LEFT JOIN d ON f.k = d.k GROUP BY d.seg"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW ml AS {q}")
    lh.sql("UPDATE d SET seg = 'z' WHERE k = 1")
    r = lh.sql("REFRESH MATERIALIZED VIEW ml").collect()[0]
    assert r.mode == "full"
    assert _rows(lh, "SELECT * FROM ml") == _rows(lh, q)


_op = st.sampled_from(
    [
        "INSERT INTO f VALUES (1, 4), (5, 6)",
        "INSERT INTO f VALUES (9, 2)",
        "DELETE FROM f WHERE x > 50",
        "UPDATE f SET x = x + 3 WHERE k = 2",
        "INSERT INTO d VALUES (5, 'c')",
        "INSERT INTO d VALUES (9, 'a')",
        "DELETE FROM d WHERE k = 2",
        "UPDATE d SET seg = 'b' WHERE k = 1",
        "UPDATE d SET seg = 'c' WHERE seg = 'a'",
    ]
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_matches_recompute_under_random_fact_and_dim_dml(
    spark, tmp_path_factory, ops
):
    lh = Lakehouse(
        spark, warehouse=str(tmp_path_factory.mktemp("mvdch"))
    )
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    for op in ops:
        lh.sql(op)
        r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
        assert r.mode in ("incremental", "noop")
        assert _rows(lh, "SELECT * FROM m") == _rows(lh, _Q)
