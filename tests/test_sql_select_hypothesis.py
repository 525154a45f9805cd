"""Property-based SELECT conformance for the SQL front-end (round-8
verdict item 5): the DML sweep is property-based, but SELECT routing —
dotted-name mangling, view expansion, literal protection — was only
example-based.  This sweep generates SELECTs (projection / filter /
group-by / HAVING / named + inline windows / join / IN-subquery /
derived table) over DOTTED lakehouse table names and runs each twice:
through ``Lakehouse.sql`` (which must rewrite ``bronze.fact`` to its
mangled registered view) and through plain ``spark.sql`` over
directly-registered temp views of the same data.  Any routing drift —
a literal rewritten, a qualified column mis-mangled, a window clause
mangled into the wrong scope — diverges row-for-row.

The fixture data deliberately contains the STRING ``'bronze.fact'`` as
a cat value: a predicate comparing against that literal selects real
rows, so if ``_sub_ident`` ever rewrote inside string literals the
result sets would differ (not just stay vacuously equal).

Budgeted like the DML sweeps: Spark queries are ~0.3 s, so bounded
examples; failures shrink to a minimal (template, params) pair."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

# {fact}/{dim} are filled with either the dotted lakehouse names or the
# plain reference views; every other placeholder comes from hypothesis.
TEMPLATES = [
    # projection + filter (dotted name in scope, literal in predicate)
    "SELECT k, v FROM {fact} WHERE v > {n} ORDER BY k",
    "SELECT k, cat FROM {fact} WHERE cat = 'bronze.fact' ORDER BY k",
    "SELECT k, cat FROM {fact} WHERE cat <> 'bronze.fact' AND k % 3 = {m} "
    "ORDER BY k",
    # fully-qualified column references through the mangling rewrite
    "SELECT {fact}.k, {fact}.v FROM {fact} WHERE {fact}.v BETWEEN {n} "
    "AND {n2} ORDER BY {fact}.k",
    # group-by / HAVING over a computed group
    "SELECT g, COUNT(*) AS n, SUM(v) AS sv FROM {fact} GROUP BY g "
    "HAVING SUM(v) > {n} ORDER BY g",
    "SELECT k % {d} AS b, AVG(v) AS av FROM {fact} WHERE v > {n} "
    "GROUP BY k % {d} ORDER BY b",
    # inline window
    "SELECT k, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, k) AS rn "
    "FROM {fact} WHERE k % 3 <> {m} ORDER BY k",
    "SELECT k, SUM(v) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN "
    "UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM {fact} ORDER BY k",
    # named WINDOW clause (the verdict's named-window case)
    "SELECT k, SUM(v) OVER w AS sw, MIN(v) OVER w AS mw FROM {fact} "
    "WINDOW w AS (PARTITION BY g ORDER BY v, k) ORDER BY k",
    # join between two dotted names, aliased and not
    "SELECT f.k, f.v, d.name FROM {fact} f JOIN {dim} d ON f.k = d.k "
    "WHERE f.v > {n} ORDER BY f.k",
    "SELECT {fact}.k, {dim}.name FROM {fact} JOIN {dim} "
    "ON {fact}.k = {dim}.k ORDER BY {fact}.k",
    # IN-subquery across tables
    "SELECT k, v FROM {fact} WHERE k IN (SELECT k FROM {dim} "
    "WHERE name <> 'x{m}') ORDER BY k, v",
    # derived table over an aggregate
    "SELECT g, sv FROM (SELECT g, SUM(v) AS sv FROM {fact} GROUP BY g) "
    "WHERE sv > {n} ORDER BY g",
    # scalar subquery + set op
    "SELECT k FROM {fact} WHERE v > (SELECT AVG(v) FROM {fact}) "
    "ORDER BY k",
    "SELECT k FROM {fact} WHERE k < {d} UNION SELECT k FROM {dim} "
    "WHERE k >= {d} ORDER BY k",
]


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("selhyp")
    fact = spark.createDataFrame(
        [
            (k, k % 4, (k * 7) % 23, ["a", "b", "bronze.fact"][k % 3])
            for k in range(30)
        ],
        "k int, g int, v int, cat string",
    )
    dim = spark.createDataFrame(
        [(k, f"x{k % 5}") for k in range(0, 30, 2)], "k int, name string"
    )
    ParquetTable.create(spark, str(base / "fact"), fact)
    ParquetTable.create(spark, str(base / "dim"), dim)
    lh = Lakehouse(spark)
    lh.register("bronze.fact", str(base / "fact"))
    lh.register("dim.d", str(base / "dim"))
    # the reference side reads the SAME parquet through plain temp views
    ParquetTable.for_path(spark, str(base / "fact")).read(
    ).createOrReplaceTempView("ref_fact")
    ParquetTable.for_path(spark, str(base / "dim")).read(
    ).createOrReplaceTempView("ref_dim")
    return lh


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tpl=st.sampled_from(TEMPLATES),
    n=st.integers(0, 20),
    n2=st.integers(0, 22),
    m=st.integers(0, 4),
    d=st.integers(2, 6),
)
def test_select_routing_matches_spark_sql(spark, tables, tpl, n, n2, m, d):
    lh = tables
    params = dict(n=n, n2=max(n, n2), m=m, d=d)
    ours = lh.sql(tpl.format(fact="bronze.fact", dim="dim.d", **params))
    want = spark.sql(tpl.format(fact="ref_fact", dim="ref_dim", **params))
    assert ours.columns == want.columns, tpl
    got = sorted(map(tuple, ours.collect()))
    exp = sorted(map(tuple, want.collect()))
    assert got == exp, f"{tpl} with {params}"
