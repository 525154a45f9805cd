"""``INSERT INTO/OVERWRITE ... BY NAME`` (round-10 SQL surface).

Databricks semantics pinned here: source columns match target columns
by NAME in any order; target columns absent from the source take their
DEFAULT (write-time, via the table layer) or a typed NULL; a NOT NULL
column with neither raises at the write's constraint check; unknown
source columns, duplicate source names, a column list, and assigning
identity/generated columns all refuse.
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _rows(lh, name="t"):
    return sorted(
        tuple(r) for r in lh.sql(f"SELECT * FROM {name}").collect()
    )


def test_by_name_reorders_and_null_fills(lh):
    lh.sql(
        "CREATE TABLE t AS SELECT col1 AS a, col2 AS b, col3 AS c "
        "FROM VALUES (1, 'x', 1.5)"
    )
    lh.sql("INSERT INTO t BY NAME SELECT 'y' AS b, 2 AS a")
    assert _rows(lh) == [(1, "x", 1.5), (2, "y", None)]


def test_by_name_overwrite(lh):
    lh.sql(
        "CREATE TABLE t AS SELECT col1 AS a, col2 AS b FROM VALUES (1, 'x')"
    )
    lh.sql("INSERT OVERWRITE t BY NAME SELECT 'z' AS b, 9 AS a")
    assert _rows(lh) == [(9, "z")]


def test_by_name_fills_default(lh):
    lh.sql(
        "CREATE TABLE t (a INT, cat STRING DEFAULT 'misc', v DOUBLE)"
    )
    lh.sql("INSERT INTO t BY NAME SELECT 1 AS a, 2.0 AS v")
    assert _rows(lh) == [(1, "misc", 2.0)]


def test_by_name_unknown_column_raises(lh):
    lh.sql("CREATE TABLE t AS SELECT col1 AS a FROM VALUES (1)")
    with pytest.raises(ValueError, match="no columns.*zz"):
        lh.sql("INSERT INTO t BY NAME SELECT 1 AS a, 2 AS zz")


def test_by_name_with_column_list_raises(lh):
    lh.sql("CREATE TABLE t AS SELECT col1 AS a FROM VALUES (1)")
    with pytest.raises(ValueError, match="no column list"):
        lh.sql("INSERT INTO t (a) BY NAME SELECT 1 AS a")


def test_by_name_not_null_without_default_raises(lh):
    lh.sql("CREATE TABLE t (a INT NOT NULL, b STRING)")
    lh.sql("INSERT INTO t BY NAME SELECT 'x' AS b, 1 AS a")
    with pytest.raises(Exception, match="(?i)not null|constraint"):
        lh.sql("INSERT INTO t BY NAME SELECT 'y' AS b")


def test_by_name_identity_passthrough(lh):
    lh.sql(
        "CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)"
    )
    lh.sql("INSERT INTO t BY NAME SELECT 'a' AS v")
    lh.sql("INSERT INTO t BY NAME SELECT 'b' AS v")
    rows = sorted(
        (r.v, r.id) for r in lh.sql("SELECT * FROM t").collect()
    )
    assert [v for v, _ in rows] == ["a", "b"]
    assert len({i for _, i in rows}) == 2  # identity assigned uniquely
    with pytest.raises(ValueError, match="identity/generated"):
        lh.sql("INSERT INTO t BY NAME SELECT 5 AS id, 'c' AS v")
