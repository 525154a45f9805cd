"""SQL session variables (Databricks / Spark 4 ``DECLARE [OR REPLACE]
VARIABLE`` / ``SET VAR`` / ``DROP TEMPORARY VARIABLE``) through the
front-end.

Spark implements the variables natively; the front-end's job is
routing — and the interesting property is that variables resolve in
EVERY statement class that ends in the analyzer: plain SELECT, the
QUALIFY rewrite, INSERT source queries, and the engine's own DML row
markers (``F.expr`` predicates go through the same analyzer, so a
DELETE/UPDATE predicate can reference a session variable)."""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    lh.sql(
        "CREATE TABLE sv AS SELECT col1 AS k, col2 AS v FROM VALUES "
        "(1, 10), (2, 20), (3, 30)"
    )
    yield lh
    for name in ("threshold", "bump"):
        try:
            spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {name}")
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass


def test_declare_set_select(lh):
    lh.sql("DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 15")
    assert lh.sql("SELECT threshold AS t").collect()[0].t == 15
    lh.sql("SET VAR threshold = 25")
    got = lh.sql("SELECT k FROM sv WHERE v > threshold").collect()
    assert sorted(r.k for r in got) == [3]


def test_variable_in_dml_predicate_and_assignment(lh):
    lh.sql("DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 20")
    lh.sql("DECLARE OR REPLACE VARIABLE bump INT DEFAULT 5")
    lh.sql("UPDATE sv SET v = v + bump WHERE v >= threshold")
    rows = {r.k: r.v for r in lh.sql("SELECT * FROM sv").collect()}
    assert rows == {1: 10, 2: 25, 3: 35}
    lh.sql("DELETE FROM sv WHERE v > threshold")
    assert sorted(r.k for r in lh.sql("SELECT k FROM sv").collect()) == [1]


def test_variable_in_insert_source(lh):
    lh.sql("DECLARE OR REPLACE VARIABLE bump INT DEFAULT 7")
    lh.sql("INSERT INTO sv SELECT 9 AS k, bump AS v")
    assert (
        lh.sql("SELECT v FROM sv WHERE k = 9").collect()[0].v == 7
    )


def test_variable_in_qualify(lh):
    lh.sql("DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 1")
    got = lh.sql(
        "SELECT k FROM sv QUALIFY ROW_NUMBER() OVER (ORDER BY v DESC) "
        "<= threshold"
    ).collect()
    assert [r.k for r in got] == [3]


def test_drop_variable_then_reference_fails(lh):
    lh.sql("DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 1")
    lh.sql("DROP TEMPORARY VARIABLE threshold")
    with pytest.raises(Exception, match="threshold|VARIABLE|resolve"):
        lh.sql("SELECT threshold AS t").collect()


def test_script_with_variables(lh):
    out = lh.sql_script(
        """
        DECLARE OR REPLACE VARIABLE threshold INT DEFAULT 0;
        SET VAR threshold = (SELECT MAX(v) FROM sv) - 5;
        SELECT k FROM sv WHERE v > threshold
        """
    ).collect()
    assert [r.k for r in out] == [3]
