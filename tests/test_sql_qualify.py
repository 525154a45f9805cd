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


def test_qualify_distinct_head_keeps_standard_order(lh):
    # QUALIFY filters BEFORE DISTINCT dedups (round 11: rewrite, not
    # refusal): the rank-2 rows per k are (1,'c',7) and (2,'d',3);
    # DISTINCT then collapses the projected k values
    rows = lh.sql(
        "SELECT DISTINCT k FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) <= 2"
    ).collect()
    assert sorted(r.k for r in rows) == [1, 2]
    # the filter ran pre-dedup: a predicate keeping only one row per k
    # still yields both distinct keys, while a rank over the DISTINCT
    # projection would have collapsed to a single row first
    rows = lh.sql(
        "SELECT DISTINCT k FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1"
    ).collect()
    assert sorted(r.k for r in rows) == [1, 2]


def test_qualify_in_first_set_operation_branch(lh):
    rows = lh.sql(
        "SELECT k FROM q QUALIFY ROW_NUMBER() OVER (ORDER BY v DESC) = 1 "
        "UNION ALL SELECT k FROM q"
    ).collect()
    # branch 1 keeps only the global-max row (k=1, v=9); branch 2 all 5
    assert sorted(r.k for r in rows) == [1, 1, 1, 1, 2, 2]


def test_qualify_in_last_set_operation_branch(lh):
    rows = lh.sql(
        "SELECT k FROM q WHERE k = 2 UNION ALL SELECT k FROM q "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY v DESC) = 1"
    ).collect()
    assert sorted(r.k for r in rows) == [1, 2, 2]


def test_qualify_in_both_set_operation_branches_with_order(lh):
    rows = lh.sql(
        "SELECT k, v FROM q QUALIFY ROW_NUMBER() OVER (ORDER BY v DESC) = 1 "
        "UNION ALL SELECT k, v FROM q "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY v) <= 2 "
        "ORDER BY v LIMIT 2"
    ).collect()
    # branch 1 -> (1,9); branch 2 -> (2,3),(2,4); global ORDER BY v
    # LIMIT 2 applies to the WHOLE union
    assert [(r.k, r.v) for r in rows] == [(2, 3), (2, 4)]


def test_qualify_star_except_head_is_not_a_set_op(lh):
    rows = lh.sql(
        "SELECT * EXCEPT (s) FROM q "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1"
    ).collect()
    assert sorted((r.k, r.v) for r in rows) == [(1, 9), (2, 4)]


def test_qualify_word_inside_string_is_inert(lh):
    rows = lh.sql("SELECT 'no QUALIFY here' AS t FROM q LIMIT 1").collect()
    assert rows[0].t == "no QUALIFY here"


# --- property sweep: QUALIFY vs the DataFrame window+filter twin -----------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_RANKS = {
    "ROW_NUMBER": F.row_number,
    "RANK": F.rank,
    "DENSE_RANK": F.dense_rank,
}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(sorted(_RANKS)),
    part=st.sampled_from(["k", "s", None]),
    order=st.sampled_from([("v",), ("s", "v")]),
    desc=st.booleans(),
    k=st.integers(1, 3),
    eq=st.booleans(),
)
def test_qualify_matches_window_filter_twin(
    spark, tmp_path_factory, fn, part, order, desc, k, eq
):
    """Random QUALIFY shapes vs the hand-built window + filter plan.
    The order keys form a deterministic TOTAL order (v is unique) —
    ROW_NUMBER over tied keys picks plan-dependent rows, and the two
    paths are different physical plans, so a tied order would compare
    two legitimate answers."""
    rows = [(i % 4, "pqrs"[i % 3], i) for i in range(24)]
    df = spark.createDataFrame(rows, "k int, s string, v int")
    df.createOrReplaceTempView("q_sweep")
    lh = Lakehouse(spark)

    od = ", ".join(f"{c} {'DESC' if desc else 'ASC'}" for c in order)
    over = f"ORDER BY {od}" if part is None else f"PARTITION BY {part} ORDER BY {od}"
    cmp_ = "=" if eq else "<="
    got = sorted(
        tuple(r)
        for r in lh.sql(
            f"SELECT k, s, v FROM q_sweep QUALIFY {fn}() OVER ({over}) {cmp_} {k}"
        ).collect()
    )

    keys = [F.col(c).desc() if desc else F.col(c).asc() for c in order]
    w = Window.orderBy(*keys)
    if part is not None:
        w = w.partitionBy(part)
    rn = _RANKS[fn]().over(w)
    cond = rn == k if eq else rn <= k
    want = sorted(
        tuple(r)
        for r in df.withColumn("__rn", cond)
        .filter("__rn")
        .drop("__rn")
        .collect()
    )
    assert got == want, (fn, part, order, desc, k, eq)
