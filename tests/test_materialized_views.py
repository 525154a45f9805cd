"""Materialized views with CDF-driven incremental refresh
(``sources/mv.py`` + the CREATE/REFRESH/DROP MATERIALIZED VIEW
statements).

The done-criterion is the hypothesis sweep: after ANY random DML
sequence on the base table, an incremental refresh must leave the MV
row-identical to recomputing its defining query from scratch — the
signed-weight CDF delta and the NULL-exact SUM reconstruction have to
agree with Spark's own aggregate under every composition.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _mk_base(lh, name="b"):
    lh.sql(
        f"CREATE TABLE {name} AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (1, 20), (2, 5), (2, NULL), (3, 7)"
    )


def _mv_rows(lh, name="m"):
    return sorted(
        (tuple(r) for r in lh.sql(f"SELECT * FROM {name}").collect()),
        key=str,
    )


def _recompute(lh, q):
    return sorted((tuple(r) for r in lh.sql(q).collect()), key=str)


_Q = "SELECT g, SUM(x) AS sx, COUNT(*) AS n, COUNT(x) AS nx FROM b GROUP BY g"


def test_create_and_read(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    assert _mv_rows(lh) == _recompute(lh, _Q)


def test_incremental_after_mixed_dml(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    lh.sql("INSERT INTO b VALUES (1, 100), (4, 1)")  # new + new group
    lh.sql("UPDATE b SET x = 50 WHERE g = 2 AND x = 5")
    lh.sql("DELETE FROM b WHERE g = 3")  # group death
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh) == _recompute(lh, _Q)
    assert all(t[0] != 3 for t in _mv_rows(lh))  # dead group dropped


def test_sum_null_semantics_round_trip(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    # delete group 2's only non-NULL x: its SUM must become NULL (not 0)
    lh.sql("DELETE FROM b WHERE g = 2 AND x = 5")
    lh.sql("REFRESH MATERIALIZED VIEW m")
    rows = {r.g: (r.sx, r.n, r.nx) for r in lh.sql("SELECT * FROM m").collect()}
    assert rows[2] == (None, 1, 0)
    assert _mv_rows(lh) == _recompute(lh, _Q)


def test_noop_refresh_commits_nothing(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    before = lh.table("m__mvdata").latest_version()
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "noop"
    assert lh.table("m__mvdata").latest_version() == before


def test_refresh_full_forces(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    lh.sql("INSERT INTO b VALUES (9, 9)")
    r = lh.sql("REFRESH MATERIALIZED VIEW m FULL").collect()[0]
    assert r.mode == "full"
    assert _mv_rows(lh) == _recompute(lh, _Q)


def test_where_clause_filters_changes(lh):
    _mk_base(lh)
    q = "SELECT g, COUNT(*) AS n FROM b WHERE x > 6 GROUP BY g"
    lh.sql(f"CREATE MATERIALIZED VIEW mw AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 3), (1, 30)")  # one below, one above
    assert lh.sql("REFRESH MATERIALIZED VIEW mw").collect()[0].mode == "incremental"
    assert _mv_rows(lh, "mw") == _recompute(lh, q)


def test_global_aggregate_mv(lh):
    _mk_base(lh)
    q = "SELECT SUM(x) AS sx, COUNT(*) AS n FROM b"
    lh.sql(f"CREATE MATERIALIZED VIEW mg AS {q}")
    lh.sql("DELETE FROM b WHERE g = 1")
    lh.sql("INSERT INTO b VALUES (8, 80)")
    assert lh.sql("REFRESH MATERIALIZED VIEW mg").collect()[0].mode == "incremental"
    assert _mv_rows(lh, "mg") == _recompute(lh, q)


def test_projection_mv_appends_incrementally_then_falls_back(lh):
    _mk_base(lh)
    q = "SELECT g, x * 2 AS x2 FROM b WHERE x IS NOT NULL"
    lh.sql(f"CREATE MATERIALIZED VIEW mp AS {q}")
    lh.sql("INSERT INTO b VALUES (5, 50)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mp").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mp") == _recompute(lh, q)
    lh.sql("DELETE FROM b WHERE g = 5")  # rewrite commit: projection
    r = lh.sql("REFRESH MATERIALIZED VIEW mp").collect()[0]
    assert r.mode == "full"  # can't subtract from a multiset projection
    assert _mv_rows(lh, "mp") == _recompute(lh, q)


def test_star_join_aggregate_is_now_incremental(lh):
    # round 11: the fact⋈dim groupBy shape maintains incrementally
    # under fact DML (tests/test_mv_join.py has the full matrix) —
    # this pin used to assert the pre-join-support full-only fallback
    _mk_base(lh)
    lh.sql("CREATE TABLE d AS SELECT col1 AS g, col2 AS nm FROM VALUES (1,'a'),(2,'b')")
    q = "SELECT b.g AS g, SUM(b.x) AS sx FROM b JOIN d ON b.g = d.g GROUP BY b.g"
    lh.sql(f"CREATE MATERIALIZED VIEW mj AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 1)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mj").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mj") == _recompute(lh, q)


def test_ineligible_query_is_full_only(lh):
    _mk_base(lh)
    q = "SELECT g, COUNT(DISTINCT x) AS dx FROM b GROUP BY g"
    lh.sql(f"CREATE MATERIALIZED VIEW md AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 1), (7, 70)")
    r = lh.sql("REFRESH MATERIALIZED VIEW md").collect()[0]
    assert r.mode == "full"
    assert _mv_rows(lh, "md") == _recompute(lh, q)


def test_distinct_mv_maintains_incrementally(lh):
    # round 11: SELECT DISTINCT ≡ zero-aggregate GROUP BY — maintained
    # under any DML; a key leaves when its last row does
    _mk_base(lh)
    q = "SELECT DISTINCT g FROM b"
    lh.sql(f"CREATE MATERIALIZED VIEW mdk AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 1), (7, 70)")  # dup key + new key
    r = lh.sql("REFRESH MATERIALIZED VIEW mdk").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mdk") == _recompute(lh, q)
    lh.sql("DELETE FROM b WHERE g = 1 AND x = 1")  # key survives (2 rows left)
    lh.sql("REFRESH MATERIALIZED VIEW mdk")
    assert _mv_rows(lh, "mdk") == _recompute(lh, q)
    lh.sql("DELETE FROM b WHERE g = 1")  # key death
    r = lh.sql("REFRESH MATERIALIZED VIEW mdk").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mdk") == _recompute(lh, q)
    assert all(t[0] != 1 for t in _mv_rows(lh, "mdk"))


def test_distinct_mv_multi_item_with_where_and_expr(lh):
    _mk_base(lh)
    q = "SELECT DISTINCT g, x % 3 AS x3 FROM b WHERE x IS NOT NULL"
    lh.sql(f"CREATE MATERIALIZED VIEW mdw AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 13), (2, NULL), (5, 6)")
    lh.sql("UPDATE b SET x = x + 1 WHERE g = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW mdw").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mdw") == _recompute(lh, q)


def test_distinct_mv_over_star_join(lh):
    _mk_base(lh)
    lh.sql(
        "CREATE TABLE dd AS SELECT col1 AS g, col2 AS nm FROM VALUES "
        "(1,'a'),(2,'b'),(3,'c')"
    )
    q = "SELECT DISTINCT dd.nm AS nm FROM b JOIN dd ON b.g = dd.g"
    lh.sql(f"CREATE MATERIALIZED VIEW mdj AS {q}")
    lh.sql("DELETE FROM b WHERE g = 3")  # 'c' dies
    lh.sql("INSERT INTO b VALUES (2, 99)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mdj").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mdj") == _recompute(lh, q)
    assert all(t[0] != "c" for t in _mv_rows(lh, "mdj"))


def test_drop_materialized_view(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    with pytest.raises(ValueError, match="MATERIALIZED"):
        lh.sql("DROP VIEW m")
    lh.sql("DROP MATERIALIZED VIEW m")
    assert "m" not in lh.sql("SHOW VIEWS").collect()
    with pytest.raises(KeyError):
        lh.sql("REFRESH MATERIALIZED VIEW m")
    lh.sql("DROP MATERIALIZED VIEW IF EXISTS m")  # absent: no raise


# --- the done-criterion sweep ----------------------------------------------

KEYS = [1, 2, 3]

_op = st.one_of(
    st.tuples(
        st.just("insert"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50) | st.none()),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(
        st.just("update"), st.sampled_from(KEYS), st.integers(0, 50)
    ),
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_incremental_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvhyp")))
    lh.sql(
        "CREATE TABLE hb AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (2, NULL), (3, 7)"
    )
    q = (
        "SELECT g, SUM(x) AS sx, COUNT(*) AS n, COUNT(x) AS nx, "
        "AVG(x) AS ax FROM hb GROUP BY g"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hm AS {q}")
    for op in ops:
        if op[0] == "insert":
            vals = ", ".join(
                f"({g}, {'NULL' if x is None else x})" for g, x in op[1]
            )
            lh.sql(f"INSERT INTO hb VALUES {vals}")
        elif op[0] == "delete":
            lh.sql(f"DELETE FROM hb WHERE g = {op[1]}")
        else:
            lh.sql(f"UPDATE hb SET x = x + {op[2]} WHERE g = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hm").collect()[0]
        assert r.mode in ("incremental", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hm").collect()), key=str
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops}"


_QM = (
    "SELECT g, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n "
    "FROM b GROUP BY g"
)


def test_min_max_incremental_under_appends(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW mm AS {_QM}")
    lh.sql("INSERT INTO b VALUES (1, 5), (2, 99), (6, NULL)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mm").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mm") == _recompute(lh, _QM)
    rows = {x.g: (x.mn, x.mx) for x in lh.sql("SELECT * FROM mm").collect()}
    assert rows[1] == (5, 20)  # new minimum folded in
    assert rows[6] == (None, None)  # all-NULL group stays NULL


def test_min_max_rescans_only_on_extremum_removal(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW mm2 AS {_QM}")
    # delete the current minimum of g=1: the optimistic fold is
    # unsound for exactly that group -> targeted rescan (round-10
    # upgrade; previously a FULL recompute)
    lh.sql("DELETE FROM b WHERE g = 1 AND x = 10")
    r = lh.sql("REFRESH MATERIALIZED VIEW mm2").collect()[0]
    assert r.mode == "incremental_rescan"
    assert _mv_rows(lh, "mm2") == _recompute(lh, _QM)
    rows = {x.g: x.mn for x in lh.sql("SELECT * FROM mm2").collect()}
    assert rows[1] == 20  # the rescan found the survivor


def test_min_max_folds_when_removal_is_dominated(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW mm3 AS {_QM}")
    # remove a NON-extremal value (g=1 holds {10, 20}; 20 is max,
    # 10 is min -> removing nothing extremal needs a mixed batch):
    lh.sql("INSERT INTO b VALUES (1, 15)")
    lh.sql("REFRESH MATERIALIZED VIEW mm3")
    lh.sql("DELETE FROM b WHERE g = 1 AND x = 15")  # 10 < 15 < 20
    r = lh.sql("REFRESH MATERIALIZED VIEW mm3").collect()[0]
    assert r.mode == "incremental", "dominated removal must fold, not rescan"
    assert _mv_rows(lh, "mm3") == _recompute(lh, _QM)


def test_min_max_update_moves_extremum_exactly(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW mm4 AS {_QM}")
    # UPDATE = remove pre-image + insert post-image in one window:
    # raising the minimum retracts the stored extremum (rescan), and
    # the post-image must win
    lh.sql("UPDATE b SET x = 500 WHERE g = 1 AND x = 10")
    r = lh.sql("REFRESH MATERIALIZED VIEW mm4").collect()[0]
    assert r.mode == "incremental_rescan"
    assert _mv_rows(lh, "mm4") == _recompute(lh, _QM)
    rows = {x.g: (x.mn, x.mx) for x in lh.sql("SELECT * FROM mm4").collect()}
    assert rows[1] == (20, 500)


def test_global_min_max_fold_and_rescan(lh):
    _mk_base(lh)
    q = "SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n FROM b"
    lh.sql(f"CREATE MATERIALIZED VIEW gm AS {q}")
    lh.sql("DELETE FROM b WHERE x = 7")  # 7 is neither min nor max...
    # base x values: 10, 20, 5, NULL, 7 -> min 5, max 20; 7 dominated
    r = lh.sql("REFRESH MATERIALIZED VIEW gm").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "gm") == _recompute(lh, q)
    lh.sql("DELETE FROM b WHERE x = 20")  # the global max: rescan
    r = lh.sql("REFRESH MATERIALIZED VIEW gm").collect()[0]
    assert r.mode == "incremental_rescan"
    assert _mv_rows(lh, "gm") == _recompute(lh, q)


def test_incremental_refresh_is_one_atomic_commit(lh):
    """State fold + dependency cursor land in ONE commit — a crash can
    leave the old state (delta replays once) or the new state (cursor
    advanced), never a folded state whose cursor re-applies the same
    delta (double-apply)."""
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    data = lh.table("m__mvdata")
    before = data.latest_version()
    lh.sql("INSERT INTO b VALUES (1, 100)")
    lh.sql("REFRESH MATERIALIZED VIEW m")
    assert data.latest_version() == before + 1  # exactly one commit
    assert (
        data.properties()["mv_dep_version"]
        == lh.table("b").latest_version()
    )


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_extrema_incremental_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    """Round-10 done-criterion for the retraction rescan: after ANY
    random DML sequence, the MIN/MAX MV refresh (optimistic fold +
    targeted rescan) must be row-identical to recomputing the defining
    query — and it must never fall back to full."""
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvext")))
    lh.sql(
        "CREATE TABLE he AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (2, NULL), (3, 7)"
    )
    q = (
        "SELECT g, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n, "
        "SUM(x) AS sx FROM he GROUP BY g"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hme AS {q}")
    for op in ops:
        if op[0] == "insert":
            vals = ", ".join(
                f"({g}, {'NULL' if x is None else x})" for g, x in op[1]
            )
            lh.sql(f"INSERT INTO he VALUES {vals}")
        elif op[0] == "delete":
            lh.sql(f"DELETE FROM he WHERE g = {op[1]}")
        else:
            lh.sql(f"UPDATE he SET x = x + {op[2]} WHERE g = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hme").collect()[0]
        assert r.mode in ("incremental", "incremental_rescan", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hme").collect()),
            key=str,
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops} (mode {r.mode})"


# --- keyed-MERGE state fold (huge-cardinality path) --------------------------


def _force_merge_fold(lh, name):
    lh.sql(
        f"ALTER TABLE {name}__mvdata SET TBLPROPERTIES "
        "('mv_fold_mode' = 'merge')"
    )


def test_merge_fold_mixed_dml_and_group_death(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    _force_merge_fold(lh, "m")
    lh.sql("INSERT INTO b VALUES (1, 100), (4, 1)")  # update + new group
    lh.sql("DELETE FROM b WHERE g = 3")  # group death -> MERGE delete
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh) == _recompute(lh, _Q)
    data = lh.table("m__mvdata")
    assert data.history(limit=1)[0].operation == "MERGE"
    assert data.properties()["mv_dep_version"] == (
        lh.table("b").latest_version()
    )


def test_merge_fold_extrema_rescan_and_death(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW mm AS {_QM}")
    _force_merge_fold(lh, "mm")
    # remove g=1's maximum (rescan) AND kill g=3 entirely (the unsafe
    # set's dead-group half: rescan finds no survivor -> MERGE delete)
    lh.sql("DELETE FROM b WHERE (g = 1 AND x = 20) OR g = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW mm").collect()[0]
    assert r.mode == "incremental_rescan"
    assert _mv_rows(lh, "mm") == _recompute(lh, _QM)
    assert all(t[0] != 3 for t in _mv_rows(lh, "mm"))
    assert lh.table("mm__mvdata").history(limit=1)[0].operation == "MERGE"


def test_merge_fold_null_group_key_falls_back_to_overwrite(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {_Q}")
    _force_merge_fold(lh, "m")
    lh.sql("INSERT INTO b VALUES (NULL, 42)")  # NULL group in the delta
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh) == _recompute(lh, _Q)
    # merge joins are null-unsafe: the fold must have overwritten
    assert lh.table("m__mvdata").history(limit=1)[0].operation == "OVERWRITE"


# --- projection MVs over row-tracked bases (round-10 composition) -----------


def _mk_tracked_base(lh, name="rb"):
    lh.sql(
        f"CREATE TABLE {name} AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (1, 20), (2, 5), (3, 7)"
    )
    lh.sql(
        f"ALTER TABLE {name} SET TBLPROPERTIES "
        "('delta.enableRowTracking' = 'true')"
    )


def test_projection_mv_maintains_under_arbitrary_dml_with_row_ids(lh):
    _mk_tracked_base(lh)
    q = "SELECT g, x * 2 AS x2 FROM rb WHERE x IS NOT NULL"
    lh.sql(f"CREATE MATERIALIZED VIEW rp AS {q}")
    # pin the keyed-MERGE landing machinery (the huge-cardinality scale
    # path); the auto route overwrites small states since round 13 —
    # covered by test_projection_mv_small_state_lands_via_overwrite
    _force_merge_fold(lh, "rp")
    # the state key never leaks into reads
    assert sorted(lh.sql("SELECT * FROM rp").columns) == ["g", "x2"]
    lh.sql("INSERT INTO rb VALUES (4, 40), (4, NULL)")
    lh.sql("UPDATE rb SET x = 11 WHERE g = 1 AND x = 10")
    lh.sql("DELETE FROM rb WHERE g = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW rp").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "rp") == _recompute(lh, q)
    assert lh.table("rp__mvdata").history(limit=1)[0].operation == "MERGE"


def test_projection_mv_small_state_lands_via_overwrite(lh):
    # round 13: the default (auto) route lands a SMALL rid-keyed state
    # via one overwrite write action instead of MERGE's probe+data+CDC —
    # identical rows, one commit, cursor advanced atomically
    _mk_tracked_base(lh, "rb2")
    q = "SELECT g, x * 2 AS x2 FROM rb2 WHERE x IS NOT NULL"
    lh.sql(f"CREATE MATERIALIZED VIEW rp2 AS {q}")
    lh.sql("INSERT INTO rb2 VALUES (4, 40), (4, NULL)")
    lh.sql("UPDATE rb2 SET x = 11 WHERE g = 1 AND x = 10")
    lh.sql("DELETE FROM rb2 WHERE g = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW rp2").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "rp2") == _recompute(lh, q)
    data = lh.table("rp2__mvdata")
    assert data.history(limit=1)[0].operation == "OVERWRITE"
    assert data.properties()["mv_dep_version"] == (
        lh.table("rb2").latest_version()
    )


def test_projection_mv_predicate_exit_deletes_row(lh):
    _mk_tracked_base(lh)
    q = "SELECT g, x FROM rb WHERE x > 6"
    lh.sql(f"CREATE MATERIALIZED VIEW rq AS {q}")
    # the update moves g=1,x=10 BELOW the predicate: same row id, image
    # now fails WHERE -> the refresh must DELETE it from the MV
    lh.sql("UPDATE rb SET x = 1 WHERE g = 1 AND x = 10")
    # and this one moves INTO the predicate
    lh.sql("UPDATE rb SET x = 100 WHERE g = 2 AND x = 5")
    r = lh.sql("REFRESH MATERIALIZED VIEW rq").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "rq") == _recompute(lh, q)


def test_projection_mv_rt_disabled_midway_falls_back(lh):
    _mk_tracked_base(lh)
    q = "SELECT g, x FROM rb WHERE x IS NOT NULL"
    lh.sql(f"CREATE MATERIALIZED VIEW rr AS {q}")
    lh.sql("ALTER TABLE rb UNSET TBLPROPERTIES ('delta.enableRowTracking')")
    lh.sql("DELETE FROM rb WHERE g = 2")  # rewrite without row ids
    r = lh.sql("REFRESH MATERIALIZED VIEW rr").collect()[0]
    assert r.mode == "full"  # id maintenance impossible; stays correct
    assert _mv_rows(lh, "rr") == _recompute(lh, q)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_projection_mv_rid_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvrid")))
    lh.sql(
        "CREATE TABLE hr AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (2, NULL), (3, 7)"
    )
    lh.sql(
        "ALTER TABLE hr SET TBLPROPERTIES "
        "('delta.enableRowTracking' = 'true')"
    )
    q = "SELECT g, x, x * 3 AS x3 FROM hr WHERE x > 5"
    lh.sql(f"CREATE MATERIALIZED VIEW hp AS {q}")
    for op in ops:
        if op[0] == "insert":
            vals = ", ".join(
                f"({g}, {'NULL' if x is None else x})" for g, x in op[1]
            )
            lh.sql(f"INSERT INTO hr VALUES {vals}")
        elif op[0] == "delete":
            lh.sql(f"DELETE FROM hr WHERE g = {op[1]}")
        else:
            lh.sql(f"UPDATE hr SET x = x + {op[2]} WHERE g = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hp").collect()[0]
        assert r.mode in ("incremental", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hp").collect()),
            key=str,
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops}"


def test_avg_incremental_with_exact_types(lh):
    """AVG = SUM/COUNT hidden state; the read view casts the quotient
    to the REAL AVG's analyzed type, so integer and decimal bases both
    hash-match a recompute (round-10: previously full-only)."""
    lh.sql(
        "CREATE TABLE ab AS SELECT col1 AS g, col2 AS x, "
        "CAST(col2 AS DECIMAL(10,2)) AS d FROM VALUES "
        "(1, 10), (1, 21), (2, 5), (2, NULL), (3, 7)"
    )
    q = "SELECT g, AVG(x) AS ax, AVG(d) AS ad, COUNT(*) AS n FROM ab GROUP BY g"
    lh.sql(f"CREATE MATERIALIZED VIEW av AS {q}")
    assert _mv_rows(lh, "av") == _recompute(lh, q)
    got = {f.name: f.dataType.simpleString()
           for f in lh.sql("SELECT * FROM av").schema.fields}
    want = {f.name: f.dataType.simpleString()
            for f in lh.sql(q).schema.fields}
    assert got == want, "view must reconstruct AVG's exact output types"
    lh.sql("INSERT INTO ab VALUES (1, 100, 3.33), (4, 8, NULL)")
    lh.sql("DELETE FROM ab WHERE g = 2 AND x = 5")  # group -> all-NULL avg
    lh.sql("UPDATE ab SET x = x + 1 WHERE g = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW av").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "av") == _recompute(lh, q)
    rows = {x.g: x.ax for x in lh.sql("SELECT * FROM av").collect()}
    assert rows[2] is None  # all-NULL group reads NULL, not 0/1


def test_having_mv_groups_enter_and_leave(lh):
    # round 11: HAVING maintains over grouped plans — the state keeps
    # EVERY group, the read view filters over reconstructed aliases
    _mk_base(lh)
    q = (
        "SELECT g, SUM(x) AS sx, COUNT(*) AS n FROM b GROUP BY g "
        "HAVING COUNT(*) >= 2"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hv AS {q}")
    assert _mv_rows(lh, "hv") == _recompute(lh, q)
    lh.sql("INSERT INTO b VALUES (3, 1), (4, 4)")  # 3 enters; 4 stays out
    lh.sql("DELETE FROM b WHERE g = 1 AND x = 10")  # 1 leaves (n -> 1)
    r = lh.sql("REFRESH MATERIALIZED VIEW hv").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "hv") == _recompute(lh, q)
    got = _mv_rows(lh, "hv")
    assert all(t[0] not in (1, 4) for t in got)
    assert any(t[0] == 3 for t in got)


def test_having_mv_hidden_aggregates(lh):
    _mk_base(lh)
    # MIN is HAVING-only: it rides hidden state the view projects away
    q = (
        "SELECT g, COUNT(*) AS n FROM b GROUP BY g "
        "HAVING MIN(x) < 8 AND SUM(x) > 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hh AS {q}")
    assert [c for c in lh.sql("SELECT * FROM hh").columns] == ["g", "n"]
    lh.sql("INSERT INTO b VALUES (4, 2)")
    lh.sql("DELETE FROM b WHERE g = 2 AND x = 5")  # min removal: rescan
    r = lh.sql("REFRESH MATERIALIZED VIEW hh").collect()[0]
    assert r.mode in ("incremental", "incremental_rescan")
    assert _mv_rows(lh, "hh") == _recompute(lh, q)


def test_having_mv_over_star_join(lh):
    _mk_base(lh)
    lh.sql(
        "CREATE TABLE dh AS SELECT col1 AS g, col2 AS nm FROM VALUES "
        "(1,'a'),(2,'b'),(3,'c')"
    )
    q = (
        "SELECT dh.nm AS nm, SUM(b.x) AS sx FROM b JOIN dh ON b.g = dh.g "
        "GROUP BY dh.nm HAVING COUNT(*) > 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hj AS {q}")
    lh.sql("INSERT INTO b VALUES (3, 9)")  # 'c' enters the HAVING set
    r = lh.sql("REFRESH MATERIALIZED VIEW hj").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "hj") == _recompute(lh, q)


def test_having_unsupported_shapes_stay_full_only(lh):
    _mk_base(lh)
    # aggregate-free HAVING (use WHERE instead): full-only
    for q in (
        "SELECT g, COUNT(*) AS n FROM b GROUP BY g HAVING g > 1",
    ):
        name = f"hf{abs(hash(q)) % 1000}"
        lh.sql(f"CREATE MATERIALIZED VIEW {name} AS {q}")
        lh.sql("INSERT INTO b VALUES (1, 3)")
        r = lh.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
        assert r.mode == "full", q
        assert _mv_rows(lh, name) == _recompute(lh, q)


def test_having_hidden_avg_is_incremental(lh):
    # round 12 (verdict #5): a HAVING-only AVG rides hidden sum/count
    # state with its exact output type analyzed from a probe query
    _mk_base(lh)
    q = "SELECT g, COUNT(*) AS n FROM b GROUP BY g HAVING AVG(x) > 5"
    lh.sql(f"CREATE MATERIALIZED VIEW havg AS {q}")
    assert _mv_rows(lh, "havg") == _recompute(lh, q)
    lh.sql("INSERT INTO b VALUES (1, 3), (2, 40), (9, 100)")
    lh.sql("DELETE FROM b WHERE g = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW havg").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "havg") == _recompute(lh, q)
    # hidden state never leaks into the read surface
    assert lh.sql("SELECT * FROM havg").columns == ["g", "n"]


def test_having_hidden_avg_decimal_type_exact(lh):
    # decimal AVG has a widened exact output type — the probe-analyzed
    # CAST must reproduce Average's own quotient bit-for-bit
    lh.sql(
        "CREATE TABLE bd AS SELECT col1 AS g, CAST(col2 AS DECIMAL(7,2))"
        " AS x FROM VALUES (1, 10.25), (1, 20.75), (2, 5.10), (3, 7.33)"
    )
    q = "SELECT g, SUM(x) AS sx FROM bd GROUP BY g HAVING AVG(x) > 6.0"
    lh.sql(f"CREATE MATERIALIZED VIEW havgd AS {q}")
    lh.sql("INSERT INTO bd VALUES (2, 9.99), (3, 0.01)")
    r = lh.sql("REFRESH MATERIALIZED VIEW havgd").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "havgd") == _recompute(lh, q)


def test_having_projected_avg_is_incremental(lh):
    _mk_base(lh)
    # AVG in HAVING is fine when PROJECTED (its exact type comes from
    # the defining query's analyzed schema)
    q = (
        "SELECT g, AVG(x) AS ax FROM b GROUP BY g "
        "HAVING AVG(x) > 6 AND COUNT(*) >= 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW ha AS {q}")
    lh.sql("INSERT INTO b VALUES (2, 50), (1, 0)")
    r = lh.sql("REFRESH MATERIALIZED VIEW ha").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "ha") == _recompute(lh, q)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_having_incremental_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvhav")))
    lh.sql(
        "CREATE TABLE hvb AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (2, NULL), (3, 7)"
    )
    # visible SUM/COUNT + hidden MIN/MAX/AVG state driving the filter
    # (hidden AVG incremental since round 12 — probe-analyzed type)
    q = (
        "SELECT g, SUM(x) AS sx, COUNT(*) AS n FROM hvb GROUP BY g "
        "HAVING COUNT(x) >= 1 AND MAX(x) < 45 AND SUM(x) > 2 "
        "AND AVG(x) < 40"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hvm AS {q}")
    for op in ops:
        if op[0] == "insert":
            vals = ", ".join(
                f"({g}, {'NULL' if x is None else x})" for g, x in op[1]
            )
            lh.sql(f"INSERT INTO hvb VALUES {vals}")
        elif op[0] == "delete":
            lh.sql(f"DELETE FROM hvb WHERE g = {op[1]}")
        else:
            lh.sql(f"UPDATE hvb SET x = x + {op[2]} WHERE g = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hvm").collect()[0]
        assert r.mode in ("incremental", "incremental_rescan", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hvm").collect()),
            key=str,
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops}"


def test_having_referencing_raw_key_expr_is_full_only(lh):
    # round-11 review finding: HAVING naming a raw GROUP BY expression
    # (not its projected alias) would have built a view filtering on a
    # column the state table lacks — full-only instead
    _mk_base(lh)
    for q in (
        "SELECT g AS grp, SUM(x) AS s FROM b GROUP BY g "
        "HAVING SUM(x) > 1 AND g < 100",
        "SELECT g % 2 AS g2, COUNT(*) AS n FROM b GROUP BY g % 2 "
        "HAVING COUNT(*) > 0 AND g % 2 = 1",
    ):
        name = f"hk{abs(hash(q)) % 1000}"
        lh.sql(f"CREATE MATERIALIZED VIEW {name} AS {q}")
        lh.sql("INSERT INTO b VALUES (1, 3)")
        r = lh.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
        assert r.mode == "full", q
        assert _mv_rows(lh, name) == _recompute(lh, q)


def test_having_referencing_key_alias_is_incremental(lh):
    _mk_base(lh)
    q = (
        "SELECT g AS grp, SUM(x) AS s FROM b GROUP BY g "
        "HAVING SUM(x) > 1 AND grp < 100"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hka AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 3)")
    r = lh.sql("REFRESH MATERIALIZED VIEW hka").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "hka") == _recompute(lh, q)


# -- single-table FROM aliases (round 12) ----------------------------------
# _parse_from accepts ``FROM b f``; the single-table compute/refresh
# paths must alias the base frames so qualified refs (f.g / b.g)
# resolve — previously CREATE raised UNRESOLVED_COLUMN (ADVICE r12).

_QA = "SELECT f.g AS g, SUM(f.x) AS sx FROM b f GROUP BY f.g"


def test_single_table_alias_grouped_incremental(lh):
    _mk_base(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW ma AS {_QA}")
    assert _mv_rows(lh, "ma") == _recompute(lh, _QA)
    lh.sql("INSERT INTO b VALUES (1, 100), (4, 1)")
    lh.sql("DELETE FROM b WHERE g = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW ma").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "ma") == _recompute(lh, _QA)


def test_single_table_qualified_without_alias(lh):
    _mk_base(lh)
    q = "SELECT b.g AS g, COUNT(*) AS n FROM b GROUP BY b.g"
    lh.sql(f"CREATE MATERIALIZED VIEW mq AS {q}")
    assert _mv_rows(lh, "mq") == _recompute(lh, q)
    lh.sql("INSERT INTO b VALUES (5, 2)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mq").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mq") == _recompute(lh, q)


def test_single_table_alias_projection_append(lh):
    _mk_base(lh)
    q = "SELECT f.x AS x2 FROM b f WHERE f.x > 3"
    lh.sql(f"CREATE MATERIALIZED VIEW mpa AS {q}")
    assert _mv_rows(lh, "mpa") == _recompute(lh, q)
    lh.sql("INSERT INTO b VALUES (9, 42), (9, 1)")
    r = lh.sql("REFRESH MATERIALIZED VIEW mpa").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mpa") == _recompute(lh, q)


def test_single_table_alias_distinct(lh):
    _mk_base(lh)
    q = "SELECT DISTINCT f.g AS g FROM b f"
    lh.sql(f"CREATE MATERIALIZED VIEW mda AS {q}")
    lh.sql("INSERT INTO b VALUES (7, 1)")
    lh.sql("DELETE FROM b WHERE g = 1")
    r = lh.sql("REFRESH MATERIALIZED VIEW mda").collect()[0]
    assert r.mode == "incremental"
    assert _mv_rows(lh, "mda") == _recompute(lh, q)
