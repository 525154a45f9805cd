"""Databricks ``QUALIFY`` clause (round-10 SQL surface).

Spark has no QUALIFY; the front-end rewrites it textually to
``SELECT * EXCEPT (__qualify__) FROM (SELECT *, (<pred>) AS
__qualify__ FROM (<head>) s) WHERE __qualify__`` — the predicate sees
select-list aliases AND may contain window functions directly, windows
evaluate over the post-WHERE/GROUP rows, NULL predicates exclude, and
ORDER BY / LIMIT apply after the filter (the documented evaluation
order FROM→WHERE→GROUP→HAVING→WINDOW→QUALIFY→ORDER→LIMIT).
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    lh.sql(
        "CREATE TABLE q AS SELECT col1 AS k, col2 AS s, col3 AS v "
        "FROM VALUES (1,'a',5), (1,'b',9), (1,'c',7), (2,'d',3), (2,'e',4)"
    )
    return lh


def test_qualify_window_in_predicate(lh):
    rows = lh.sql(
        "SELECT k, s FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1"
    ).collect()
    assert sorted((r.k, r.s) for r in rows) == [(1, "b"), (2, "e")]


def test_qualify_references_select_alias(lh):
    rows = lh.sql(
        "SELECT k, s, RANK() OVER (PARTITION BY k ORDER BY v DESC) AS rnk "
        "FROM q QUALIFY rnk <= 2"
    ).collect()
    assert sorted((r.k, r.s, r.rnk) for r in rows) == [
        (1, "b", 1),
        (1, "c", 2),
        (2, "d", 2),
        (2, "e", 1),
    ]


def test_qualify_windows_see_post_where_rows(lh):
    # WHERE removes v=9 BEFORE the window ranks — 'c' becomes k=1's top
    rows = lh.sql(
        "SELECT k, s FROM q WHERE v < 9 "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1"
    ).collect()
    assert sorted((r.k, r.s) for r in rows) == [(1, "c"), (2, "e")]


def test_qualify_with_group_by_and_order_limit(lh):
    rows = lh.sql(
        "SELECT k, SUM(v) AS sv FROM q GROUP BY k "
        "QUALIFY RANK() OVER (ORDER BY SUM(v) DESC) = 1 "
        "ORDER BY k LIMIT 5"
    ).collect()
    assert [(r.k, r.sv) for r in rows] == [(1, 21)]


def test_qualify_order_limit_apply_after_filter(lh):
    rows = lh.sql(
        "SELECT k, s, v FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) <= 2 "
        "ORDER BY v DESC LIMIT 2"
    ).collect()
    # survivors are (b,9),(c,7),(e,4),(d,3); top-2 by v
    assert [(r.s, r.v) for r in rows] == [("b", 9), ("c", 7)]


def test_qualify_inside_cte_body(lh):
    rows = lh.sql(
        "WITH top AS (SELECT k, s FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1) "
        "SELECT s FROM top ORDER BY s"
    ).collect()
    assert [r.s for r in rows] == ["b", "e"]


def test_qualify_inside_stored_view(lh):
    lh.sql(
        "CREATE VIEW topv AS SELECT k, s FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1"
    )
    rows = lh.sql("SELECT s FROM topv ORDER BY s").collect()
    assert [r.s for r in rows] == ["b", "e"]


def test_qualify_null_predicate_excludes(lh):
    # NULLIF makes the predicate NULL for rank 1 rows: excluded, like WHERE
    rows = lh.sql(
        "SELECT k, s, RANK() OVER (PARTITION BY k ORDER BY v DESC) AS r "
        "FROM q QUALIFY NULLIF(r, 1) = 2"
    ).collect()
    assert sorted((r.k, r.s) for r in rows) == [(1, "c"), (2, "d")]


def test_qualify_distinct_head_raises(lh):
    with pytest.raises(ValueError, match="DISTINCT"):
        lh.sql(
            "SELECT DISTINCT k FROM q "
            "QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1"
        )


def test_qualify_set_operation_branch_raises(lh):
    with pytest.raises(ValueError, match="set-operation"):
        lh.sql(
            "SELECT k FROM q QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1 "
            "UNION ALL SELECT k FROM q"
        )


def test_qualify_word_inside_string_is_inert(lh):
    rows = lh.sql("SELECT 'no QUALIFY here' AS t FROM q LIMIT 1").collect()
    assert rows[0].t == "no QUALIFY here"
