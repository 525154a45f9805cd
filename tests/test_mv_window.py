"""Per-key WINDOW materialized views (QUALIFY over same-key windows —
the dedup-to-latest / top-k-per-key shape, ``operators/dedup.py``'s
ranking window as a view) maintained by SCOPED PER-KEY RESCAN.

A window partitioned by ``pk`` makes each output key group a pure
function of the base rows carrying that key, so a refresh recomputes
exactly the key groups the CDF window touched (pre- AND post-images —
a deleted winner retracts) and lands them via one key-group MERGE:
replace groups with survivors (multi-row groups — ``rn <= k`` — ride
the group-replace semantics), delete groups without.

Done-criterion: after ANY random DML sequence, incremental refresh
leaves the MV row-identical to recomputing the defining query.
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
        "CREATE TABLE c AS SELECT col1 AS k, col2 AS seq, col3 AS v "
        "FROM VALUES (1, 1, 'a'), (1, 2, 'b'), (2, 1, 'c'), (3, 5, 'd')"
    )


def _rows(lh, q):
    return sorted((tuple(r) for r in lh.sql(q).collect()), key=str)


_Q = (
    "SELECT k, seq, v FROM c QUALIFY ROW_NUMBER() OVER "
    "(PARTITION BY k ORDER BY seq DESC) = 1"
)


def test_dedup_to_latest_full_lifecycle(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW latest AS {_Q}")
    assert _rows(lh, "SELECT * FROM latest") == _rows(lh, _Q)
    # new winner, new key, whole-key delete, in-place update
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (4, 1, 'n')")
    lh.sql("DELETE FROM c WHERE k = 3")
    lh.sql("UPDATE c SET v = 'cc' WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW latest").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM latest") == _rows(lh, _Q)
    assert all(t[0] != 3 for t in _rows(lh, "SELECT * FROM latest"))


def test_deleting_the_winner_retracts_to_previous(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW latest AS {_Q}")
    lh.sql("DELETE FROM c WHERE k = 1 AND seq = 2")  # current winner
    r = lh.sql("REFRESH MATERIALIZED VIEW latest").collect()[0]
    assert r.mode == "incremental"
    got = {t[0]: t for t in _rows(lh, "SELECT * FROM latest")}
    assert got[1] == (1, 1, "a")  # previous row wins again
    assert _rows(lh, "SELECT * FROM latest") == _rows(lh, _Q)


def test_top_k_groups_replace_wholesale(lh):
    _mk(lh)
    q = (
        "SELECT k, seq FROM c QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY seq DESC) <= 2"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW top2 AS {q}")
    lh.sql("INSERT INTO c VALUES (1, 7, 'q'), (1, 8, 'r')")
    r = lh.sql("REFRESH MATERIALIZED VIEW top2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM top2") == _rows(lh, q)


def test_where_alias_and_tiebreakers(lh):
    _mk(lh)
    q = (
        "SELECT k AS kk, seq FROM c WHERE v <> 'x' QUALIFY ROW_NUMBER() "
        "OVER (PARTITION BY k ORDER BY seq DESC, v ASC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW w3 AS {q}")
    # the 'x' row outranks by seq but is WHERE-excluded
    lh.sql("INSERT INTO c VALUES (2, 99, 'x'), (2, 98, 'y')")
    r = lh.sql("REFRESH MATERIALIZED VIEW w3").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM w3") == _rows(lh, q)


def test_rank_and_alias_reference_forms(lh):
    _mk(lh)
    # windowed item aliased then referenced in QUALIFY — the stored
    # data table carries the rank column too
    q = (
        "SELECT k, seq, RANK() OVER (PARTITION BY k ORDER BY seq DESC) "
        "AS rnk FROM c QUALIFY rnk = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wr AS {q}")
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (1, 9, 'zz')")  # rank tie
    r = lh.sql("REFRESH MATERIALIZED VIEW wr").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wr") == _rows(lh, q)


@pytest.mark.parametrize(
    "q",
    [
        # global window: no partition key to scope the rescan
        "SELECT k, seq FROM c QUALIFY ROW_NUMBER() OVER (ORDER BY seq) = 1",
        # mixed partition keys across windows
        "SELECT k, seq FROM c QUALIFY ROW_NUMBER() OVER (PARTITION BY k "
        "ORDER BY seq) = 1 AND RANK() OVER (PARTITION BY v ORDER BY seq) = 1",
        # partition key not projected
        "SELECT seq, v FROM c QUALIFY ROW_NUMBER() OVER (PARTITION BY k "
        "ORDER BY seq DESC) = 1",
    ],
)
def test_unscopable_windows_are_full_only(lh, q):
    _mk(lh)
    name = f"wf{abs(hash(q)) % 1000}"
    lh.sql(f"CREATE MATERIALIZED VIEW {name} AS {q}")
    lh.sql("INSERT INTO c VALUES (5, 1, 'e')")
    r = lh.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
    assert r.mode == "full", q
    assert _rows(lh, f"SELECT * FROM {name}") == _rows(lh, q)


def test_null_partition_key_falls_back_to_full(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW latest AS {_Q}")
    lh.sql("INSERT INTO c VALUES (CAST(NULL AS INT), 1, 'n')")
    r = lh.sql("REFRESH MATERIALIZED VIEW latest").collect()[0]
    assert r.mode == "full"
    assert _rows(lh, "SELECT * FROM latest") == _rows(lh, _Q)


def test_optimize_only_window_advances_cursor(lh):
    _mk(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW latest AS {_Q}")
    lh.table("c").optimize(n_files=1)
    r = lh.sql("REFRESH MATERIALIZED VIEW latest").collect()[0]
    assert r.mode == "incremental"
    assert lh.sql("REFRESH MATERIALIZED VIEW latest").collect()[0].mode == "noop"
    assert _rows(lh, "SELECT * FROM latest") == _rows(lh, _Q)


# --- the done-criterion sweep ----------------------------------------------

KEYS = [1, 2, 3]

_op = st.one_of(
    st.tuples(
        st.just("insert"),
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("delete_key"), st.sampled_from(KEYS)),
    st.tuples(st.just("delete_row"), st.sampled_from(KEYS), st.integers(0, 50)),
    st.tuples(st.just("update"), st.sampled_from(KEYS), st.integers(0, 50)),
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_window_incremental_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvwhyp")))
    lh.sql(
        "CREATE TABLE hc AS SELECT col1 AS k, col2 AS seq FROM VALUES "
        "(1, 10), (2, 1), (3, 7)"
    )
    # unique (k, seq) winners: ties broken by seq keep determinism
    q = (
        "SELECT k, seq FROM hc QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hw AS {q}")
    for op in ops:
        if op[0] == "insert":
            vals = ", ".join(f"({g}, {x})" for g, x in op[1])
            lh.sql(f"INSERT INTO hc VALUES {vals}")
        elif op[0] == "delete_key":
            lh.sql(f"DELETE FROM hc WHERE k = {op[1]}")
        elif op[0] == "delete_row":
            lh.sql(f"DELETE FROM hc WHERE k = {op[1]} AND seq = {op[2]}")
        else:
            lh.sql(f"UPDATE hc SET seq = seq + {op[2]} WHERE k = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hw").collect()[0]
        assert r.mode in ("incremental", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hw").collect()), key=str
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops}"


def test_window_mv_with_from_alias(lh):
    # round 12: _parse_from accepts ``FROM c w``; the rescan paths
    # alias the base/CDF frames so qualified partition keys resolve
    _mk(lh)
    q = (
        "SELECT w.k AS k, w.seq AS seq, w.v AS v FROM c w QUALIFY "
        "ROW_NUMBER() OVER (PARTITION BY w.k ORDER BY w.seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW lw AS {q}")
    assert _rows(lh, "SELECT * FROM lw") == _rows(lh, q)
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (4, 1, 'n')")
    lh.sql("DELETE FROM c WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW lw").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM lw") == _rows(lh, q)


# --- window-over-join (round 12): fact-key rescan against frozen dims ------


def _mk_dim(lh):
    lh.sql(
        "CREATE TABLE dj AS SELECT col1 AS k, col2 AS lbl FROM VALUES "
        "(1, 'a'), (2, 'b'), (3, 'x'), (4, 'd')"
    )


_QJ = (
    "SELECT c.k AS k, c.seq AS seq, dj.lbl AS lbl FROM c "
    "JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
    "(PARTITION BY c.k ORDER BY c.seq DESC) = 1"
)


def test_window_over_join_incremental(lh):
    _mk(lh)
    _mk_dim(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW wj AS {_QJ}")
    assert _rows(lh, "SELECT * FROM wj") == _rows(lh, _QJ)
    props = lh.table("wj__mvdata").properties()
    assert props["mv_dep_dims"] == {"dj": 0}  # dims pinned at create
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (4, 1, 'n'), (7, 1, 'u')")
    lh.sql("DELETE FROM c WHERE k = 3")
    lh.sql("UPDATE c SET v = 'cc' WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wj").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wj") == _rows(lh, _QJ)


def test_window_over_join_dim_change_rescans_and_repins(lh):
    # round 12 (session 2): a moved dim no longer forces full — the
    # dim CDF joined to the current fact names the touched groups and
    # the rescan runs against the CURRENT dims, re-pinning them
    _mk(lh)
    _mk_dim(lh)
    lh.sql(f"CREATE MATERIALIZED VIEW wjd AS {_QJ}")
    lh.sql("UPDATE dj SET lbl = 'bb' WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjd").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjd") == _rows(lh, _QJ)
    lh.sql("INSERT INTO c VALUES (2, 7, 'q')")  # re-pinned: incremental
    r = lh.sql("REFRESH MATERIALIZED VIEW wjd").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjd") == _rows(lh, _QJ)


def test_window_over_join_dim_and_fact_move_together(lh):
    # fact DML + dim DML in one window: fact-CDF keys (old AND new
    # dims) union the dim-CDF keys; dim-side partition key
    _mk(lh)
    _mk_dim(lh)
    q = (
        "SELECT dj.lbl AS lbl, c.k AS k, c.seq AS seq FROM c "
        "JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY dj.lbl ORDER BY c.seq DESC, c.k) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wjdf AS {q}")
    lh.sql("INSERT INTO c VALUES (4, 20, 'n')")
    lh.sql("UPDATE dj SET lbl = 'x' WHERE k = 1")
    lh.sql("DELETE FROM dj WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjdf").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjdf") == _rows(lh, q)
    # dim insert admits previously-unmatched facts into a new group
    lh.sql("INSERT INTO dj VALUES (3, 'z')")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjdf").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjdf") == _rows(lh, q)


def test_window_left_join_dim_change_is_full(lh):
    # LEFT + dim move: a dim delete shifts rows into the NULL key
    # group, which no CDF image names — full fallback
    _mk(lh)
    _mk_dim(lh)
    q = (
        "SELECT c.k AS k, c.seq AS seq, dj.lbl AS lbl FROM c "
        "LEFT JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY c.k ORDER BY c.seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wjlf AS {q}")
    lh.sql("DELETE FROM dj WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjlf").collect()[0]
    assert r.mode == "full"
    assert _rows(lh, "SELECT * FROM wjlf") == _rows(lh, q)


def test_window_over_join_left_and_dim_order(lh):
    _mk(lh)
    _mk_dim(lh)
    # LEFT join keeps unmatched fact keys; the window may ORDER BY a
    # dim column (group content is a pure function of fact rows once
    # dims are frozen)
    q = (
        "SELECT c.k AS k, c.seq AS seq, dj.lbl AS lbl FROM c "
        "LEFT JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY c.k ORDER BY dj.lbl DESC, c.seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wjl AS {q}")
    lh.sql("INSERT INTO c VALUES (8, 1, 'm'), (1, 99, 'w')")
    lh.sql("DELETE FROM c WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjl").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjl") == _rows(lh, q)


def test_window_over_join_dim_partition_key_incremental(lh):
    # round 12 (extension): PARTITION BY a DIM attribute — touched
    # keys come from the CDF joined to the pinned dims, the scope is
    # fact ⟕semi the touched dim rows (a safe superset)
    _mk(lh)
    _mk_dim(lh)
    q = (
        "SELECT dj.lbl AS lbl, c.k AS k, c.seq AS seq FROM c "
        "JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY dj.lbl ORDER BY c.seq DESC, c.k) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wjf AS {q}")
    assert _rows(lh, "SELECT * FROM wjf") == _rows(lh, q)
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (4, 2, 'n')")  # new group
    lh.sql("DELETE FROM c WHERE k = 3")  # group death
    lh.sql("UPDATE c SET seq = 8 WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjf").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjf") == _rows(lh, q)


def test_window_over_join_mixed_keys_incremental(lh):
    # fact + dim key components: the dim side scopes (superset), the
    # MERGE lands exactly the touched (k, lbl) groups
    _mk(lh)
    _mk_dim(lh)
    q = (
        "SELECT c.k AS k, dj.lbl AS lbl, c.seq AS seq FROM c "
        "JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY c.k, dj.lbl ORDER BY c.seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wjm AS {q}")
    lh.sql("INSERT INTO c VALUES (1, 9, 'z')")
    lh.sql("DELETE FROM c WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wjm").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wjm") == _rows(lh, q)


def test_window_over_join_expression_keys_incremental(lh):
    # round 12: EXPRESSION partition keys classify to one side by
    # their single qualified ref — dim-side upper(dj.lbl) scopes
    # through the pinned dim, fact-side c.k % 2 scopes from the fact
    # CDF alone; both must be projected (aliased items)
    _mk(lh)
    _mk_dim(lh)
    q = (
        "SELECT upper(dj.lbl) AS ulbl, c.k % 2 AS kp, c.seq AS seq "
        "FROM c JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY upper(dj.lbl), c.k % 2 "
        "ORDER BY c.seq DESC, c.k) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wje AS {q}")
    assert _rows(lh, "SELECT * FROM wje") == _rows(lh, q)
    lh.sql("INSERT INTO c VALUES (1, 9, 'z'), (4, 2, 'n')")
    lh.sql("DELETE FROM c WHERE k = 3")
    r = lh.sql("REFRESH MATERIALIZED VIEW wje").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wje") == _rows(lh, q)
    lh.sql("UPDATE c SET seq = 77 WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wje").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wje") == _rows(lh, q)


def test_window_over_join_ambiguous_expression_keys_full_only(lh):
    # a BARE identifier in an expression key could be a column of
    # either side; refs spanning two aliases have no single side —
    # both refuse toward full refresh
    _mk(lh)
    _mk_dim(lh)
    for name, pk in (
        # bare identifier (unique to the fact so Spark resolves it,
        # but this parser cannot PROVE the side without a qualifier)
        ("wja1", "seq % 2"),
        ("wja2", "c.k + dj.k"),     # two aliases in one key
    ):
        q = (
            f"SELECT {pk} AS pk1, c.seq AS seq FROM c "
            "JOIN dj ON c.k = dj.k QUALIFY ROW_NUMBER() OVER "
            f"(PARTITION BY {pk} ORDER BY c.seq DESC, c.k) = 1"
        )
        lh.sql(f"CREATE MATERIALIZED VIEW {name} AS {q}")
        lh.sql(f"INSERT INTO c VALUES ({10 + len(name)}, 1, 'q')")
        r = lh.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
        assert r.mode == "full"
        assert _rows(lh, f"SELECT * FROM {name}") == _rows(lh, q)


def test_window_over_join_two_dim_keys_incremental(lh):
    # keys spread across TWO dims (round 12): one fact-semi per
    # key-carrying dim scopes the rescan; the MERGE lands only the
    # touched pairs
    _mk(lh)
    _mk_dim(lh)
    lh.sql(
        "CREATE TABLE dj2 AS SELECT col1 AS k, col2 AS z FROM VALUES "
        "(1, 'p'), (2, 'q'), (3, 'r'), (4, 's')"
    )
    q = (
        "SELECT dj.lbl AS lbl, dj2.z AS z, c.seq AS seq FROM c "
        "JOIN dj ON c.k = dj.k JOIN dj2 ON c.k = dj2.k "
        "QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY dj.lbl, dj2.z ORDER BY c.seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW wj2 AS {q}")
    lh.sql("INSERT INTO c VALUES (1, 9, 'z')")
    lh.sql("DELETE FROM c WHERE k = 2")
    r = lh.sql("REFRESH MATERIALIZED VIEW wj2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wj2") == _rows(lh, q)
    # a second wave touching a different pair, then an update
    lh.sql("INSERT INTO c VALUES (3, 11, 'w'), (4, 2, 'v')")
    lh.sql("UPDATE c SET seq = 99 WHERE k = 4")
    r = lh.sql("REFRESH MATERIALIZED VIEW wj2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM wj2") == _rows(lh, q)


_dim_op = st.sampled_from(
    [
        "UPDATE hjd SET lbl = 'c' WHERE k = 1",
        "UPDATE hjd SET lbl = 'a' WHERE lbl = 'b'",
        "DELETE FROM hjd WHERE k = 2",
        "INSERT INTO hjd VALUES (4, 'd')",
        "INSERT INTO hjd VALUES (5, 'a')",
    ]
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(st.one_of(_op, _dim_op), min_size=1, max_size=4)
)
def test_dim_key_window_over_join_matches_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    # round 12: PARTITION BY a DIM attribute — the ORDER BY ties break
    # on (seq DESC, k) so ROW_NUMBER is deterministic within a lbl
    # group even when several fact keys share the label
    lh = Lakehouse(spark, warehouse=str(tmp_path_factory.mktemp("mvdjh")))
    lh.sql(
        "CREATE TABLE hjc AS SELECT col1 AS k, col2 AS seq FROM VALUES "
        "(1, 10), (2, 1), (3, 7)"
    )
    lh.sql(
        "CREATE TABLE hjd AS SELECT col1 AS k, col2 AS lbl FROM VALUES "
        "(1, 'a'), (2, 'a'), (3, 'b')"
    )
    q = (
        "SELECT d.lbl AS lbl, f.k AS k, f.seq AS seq FROM hjc f "
        "JOIN hjd d ON f.k = d.k QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY d.lbl ORDER BY f.seq DESC, f.k) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW hjw AS {q}")
    for op in ops:
        if isinstance(op, str):  # dim DML (round 12, session 2)
            lh.sql(op)
        elif op[0] == "insert":
            vals = ", ".join(f"({g}, {x})" for g, x in op[1])
            lh.sql(f"INSERT INTO hjc VALUES {vals}")
        elif op[0] == "delete_key":
            lh.sql(f"DELETE FROM hjc WHERE k = {op[1]}")
        elif op[0] == "delete_row":
            lh.sql(f"DELETE FROM hjc WHERE k = {op[1]} AND seq = {op[2]}")
        else:
            lh.sql(f"UPDATE hjc SET seq = seq + {op[2]} WHERE k = {op[1]}")
        r = lh.sql("REFRESH MATERIALIZED VIEW hjw").collect()[0]
        assert r.mode in ("incremental", "noop"), op
        got = sorted(
            (tuple(r) for r in lh.sql("SELECT * FROM hjw").collect()),
            key=str,
        )
        want = sorted((tuple(r) for r in lh.sql(q).collect()), key=str)
        assert got == want, f"after {op} of {ops}"
