"""Unit matrix for ``sources.sql._from_decl_names`` — the FROM/JOIN
declaration scanner behind round-12's alias-scoping fix (an inner
``FROM s AS t`` shadows a DML target ``t``; see
test_sql_correlated_scalar for the end-to-end semantics).  Pure
string-level tests: no SparkSession, so the whole matrix runs in
milliseconds."""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import _from_decl_names


@pytest.mark.parametrize(
    ("sql", "top", "anyd"),
    [
        # bare table
        ("SELECT * FROM s", {"s"}, {"s"}),
        # AS alias and bare alias
        ("SELECT * FROM s AS t", {"s", "t"}, {"s", "t"}),
        ("SELECT * FROM s t", {"s", "t"}, {"s", "t"}),
        # comma list with aliases
        (
            "SELECT * FROM a x, b AS y WHERE x.k = y.k",
            {"a", "x", "b", "y"},
            {"a", "x", "b", "y"},
        ),
        # join chain; ON expressions must not register as declarations
        (
            "SELECT * FROM f JOIN d ON f.k = d.k LEFT JOIN e AS z "
            "ON z.k = f.k",
            {"f", "d", "e", "z"},
            {"f", "d", "e", "z"},
        ),
        # dotted names record their LAST segment
        ("SELECT * FROM bronze.claims c", {"claims", "c"}, {"claims", "c"}),
        # backticks unquote
        ("SELECT * FROM `s` AS `t`", {"s", "t"}, {"s", "t"}),
        # a derived table declares its alias at top level, its inner
        # FROMs only at nested depth
        (
            "SELECT * FROM (SELECT v FROM s AS t) z",
            {"z"},
            {"z", "s", "t"},
        ),
        # nested-in-WHERE subquery declares only at nested depth
        (
            "SELECT max(x) FROM s WHERE s.k IN (SELECT k FROM u AS t)",
            {"s"},
            {"s", "u", "t"},
        ),
        # clause keywords never swallowed as aliases
        (
            "SELECT max(x) FROM s WHERE k = 1",
            {"s"},
            {"s"},
        ),
        (
            "SELECT k FROM s GROUP BY k",
            {"s"},
            {"s"},
        ),
        # string literals cannot fake declarations
        (
            "SELECT * FROM s WHERE note = ' from fake AS t '",
            {"s"},
            {"s"},
        ),
        # extract-style FROM inside a call records only at nested depth
        (
            "SELECT extract(year FROM d) FROM s",
            {"s"},
            {"s", "d"},
        ),
    ],
)
def test_declarations(sql, top, anyd):
    got_top, got_any = _from_decl_names(sql)
    assert got_top == top
    assert got_any == anyd


def test_shadowing_classification_contract():
    # the exact ADVICE repro: inner alias t at TOP level -> the caller
    # treats target-name refs as inner-scope (uncorrelated)
    top, anyd = _from_decl_names("SELECT max(x) FROM s AS t WHERE t.k = 1")
    assert "t" in top
    # nested-only declaration -> ambiguous -> the caller refuses
    top, anyd = _from_decl_names(
        "SELECT max(z.v) FROM (SELECT u.v AS v FROM s AS t "
        "JOIN s u ON t.k = u.k) z"
    )
    assert "t" not in top and "t" in anyd
