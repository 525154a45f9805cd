"""Uncorrelated scalar subqueries in DML (round-10 SQL surface).

Databricks supports scalar subqueries in UPDATE SET values and in
DELETE/UPDATE WHERE comparisons (``UPDATE t SET v = (SELECT max(x)
FROM s)``; ``DELETE FROM t WHERE v < (SELECT avg(v) FROM t)``).  The
engine folds each one ONCE against the pre-statement snapshot into a
typed SQL literal and rides the ordinary row-wise DML path — exactly
the eager-evaluation semantics the real engine has (a scalar subquery
never sees the statement's own writes).

Contract pinned here:
- exactly one column, at most one row; EMPTY result ⇒ typed NULL
  (the SQL scalar contract), so a NULL-comparing predicate matches
  nothing and the zero-match statement commits nothing;
- membership subqueries (IN / EXISTS) are NOT folded — they keep
  their decorrelated routes, and compound membership forms still
  raise toward MERGE;
- a subquery referencing the target's own columns is correlated and
  raises toward MERGE;
- quoted text containing '(select' never triggers any of this.
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _mk(lh):
    lh.sql(
        "CREATE TABLE t AS SELECT col1 AS k, CAST(col2 AS DOUBLE) AS v "
        "FROM VALUES (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)"
    )
    lh.sql("CREATE TABLE s AS SELECT col1 AS x FROM VALUES (5), (7)")


def _state(lh, name="t"):
    return sorted(
        (r.k, r.v) for r in lh.sql(f"SELECT * FROM {name}").collect()
    )


def test_update_set_scalar_subquery_all_rows(lh):
    _mk(lh)
    r = lh.sql("UPDATE t SET v = (SELECT MAX(x) FROM s)").collect()[0]
    assert r.num_affected_rows == 4
    assert _state(lh) == [(1, 7.0), (2, 7.0), (3, 7.0), (4, 7.0)]


def test_update_set_arithmetic_and_where_scalar(lh):
    _mk(lh)
    # SET uses one scalar, WHERE compares against another
    r = lh.sql(
        "UPDATE t SET v = v + (SELECT MIN(x) FROM s) "
        "WHERE k > (SELECT AVG(x) - 4 FROM s)"
    ).collect()[0]
    # avg(x)-4 = 2.0 -> k in {3,4}
    assert r.num_affected_rows == 2
    assert _state(lh) == [(1, 10.0), (2, 20.0), (3, 35.0), (4, 45.0)]


def test_delete_where_scalar_reads_pre_statement_snapshot(lh):
    _mk(lh)
    # subquery over the TARGET table: avg(v)=25 from the PRE-delete
    # snapshot; rows below it go, and the threshold does not drift as
    # rows are deleted (eager single evaluation)
    r = lh.sql("DELETE FROM t WHERE v < (SELECT AVG(v) FROM t)").collect()[0]
    assert r.num_affected_rows == 2
    assert _state(lh) == [(3, 30.0), (4, 40.0)]


def test_empty_scalar_subquery_is_null_matches_nothing(lh):
    _mk(lh)
    before = lh.table("t").latest_version()
    r = lh.sql(
        "DELETE FROM t WHERE v > (SELECT x FROM s WHERE x > 100)"
    ).collect()[0]
    assert r.num_affected_rows == 0
    # zero-match DML commits nothing (skipRecordingEmptyCommits parity)
    assert lh.table("t").latest_version() == before
    assert len(_state(lh)) == 4


def test_null_scalar_assignment(lh):
    _mk(lh)
    lh.sql("CREATE TABLE n AS SELECT CAST(NULL AS DOUBLE) AS x FROM VALUES (1)")
    r = lh.sql(
        "UPDATE t SET v = (SELECT x FROM n) WHERE k = 1"
    ).collect()[0]
    assert r.num_affected_rows == 1
    assert _state(lh)[0] == (1, None)


def test_multi_row_scalar_subquery_raises(lh):
    _mk(lh)
    with pytest.raises(ValueError, match="more than one row"):
        lh.sql("UPDATE t SET v = (SELECT x FROM s)")


def test_multi_column_scalar_subquery_raises(lh):
    _mk(lh)
    with pytest.raises(ValueError, match="exactly one column"):
        lh.sql("DELETE FROM t WHERE v < (SELECT x, x FROM s LIMIT 1)")


def test_correlated_scalar_set_decorrelates(lh):
    # round 11: equality-correlated aggregate SET values decorrelate to
    # a keyed lookup (tests/test_sql_correlated_scalar.py has the full
    # matrix); this pin used to assert the pre-support refusal
    _mk(lh)
    lh.sql("UPDATE t SET v = (SELECT MAX(x) FROM s WHERE s.x = t.k)")
    # no s.x equals any t.k (5,7 vs 1..4): MAX over empty = NULL
    assert _state(lh) == [(1, None), (2, None), (3, None), (4, None)]


def test_correlated_scalar_in_where_decorrelates_too(lh):
    _mk(lh)
    # no s.x equals any t.k: AVG over empty = NULL, comparison UNKNOWN,
    # zero matches — and a zero-match DML commits nothing
    before = lh.table("t").latest_version()
    r = lh.sql(
        "DELETE FROM t WHERE v < (SELECT AVG(x) FROM s WHERE s.x = t.k)"
    ).collect()[0]
    assert r.num_affected_rows == 0
    assert lh.table("t").latest_version() == before
    assert len(_state(lh)) == 4


def test_string_literal_containing_select_is_not_a_subquery(lh):
    lh.sql(
        "CREATE TABLE ts AS SELECT col1 AS k, col2 AS note "
        "FROM VALUES (1, 'x (select y)'), (2, 'plain')"
    )
    r = lh.sql(
        "DELETE FROM ts WHERE note = 'x (select y)'"
    ).collect()[0]
    assert r.num_affected_rows == 1


def test_scalar_set_composes_with_in_subquery_predicate(lh):
    _mk(lh)
    lh.sql("CREATE TABLE keys AS SELECT col1 AS kk FROM VALUES (2), (3)")
    r = lh.sql(
        "UPDATE t SET v = (SELECT MAX(x) FROM s) "
        "WHERE k IN (SELECT kk FROM keys)"
    ).collect()[0]
    assert r.num_affected_rows == 2
    assert _state(lh) == [(1, 10.0), (2, 7.0), (3, 7.0), (4, 40.0)]


def test_compound_membership_still_raises_toward_merge(lh):
    _mk(lh)
    lh.sql("CREATE TABLE keys2 AS SELECT col1 AS kk FROM VALUES (2)")
    with pytest.raises(ValueError, match="MERGE"):
        lh.sql(
            "DELETE FROM t WHERE k IN (SELECT kk FROM keys2) "
            "AND v > (SELECT MIN(x) FROM s)"
        )


def test_decimal_scalar_renders_exactly(lh):
    lh.sql(
        "CREATE TABLE td AS SELECT col1 AS k, "
        "CAST(col2 AS DECIMAL(10,2)) AS d "
        "FROM VALUES (1, 1.25), (2, 2.50)"
    )
    r = lh.sql(
        "UPDATE td SET d = (SELECT MAX(d) FROM td) WHERE k = 1"
    ).collect()[0]
    assert r.num_affected_rows == 1
    rows = {x.k: str(x.d) for x in lh.sql("SELECT * FROM td").collect()}
    assert rows == {1: "2.50", 2: "2.50"}


def test_date_scalar_renders_exactly(lh):
    lh.sql(
        "CREATE TABLE tt AS SELECT col1 AS k, CAST(col2 AS DATE) AS d "
        "FROM VALUES (1, '2024-01-05'), (2, '2024-03-09')"
    )
    r = lh.sql(
        "DELETE FROM tt WHERE d < (SELECT MAX(d) FROM tt)"
    ).collect()[0]
    assert r.num_affected_rows == 1
    assert [x.k for x in lh.sql("SELECT * FROM tt").collect()] == [2]
