"""Property-based SQL front-end conformance: every random DML sequence
must do EXACTLY the same thing whether issued as Delta-flavored SQL
statements (``sources/sql.Lakehouse``) or as the equivalent Python
table-layer calls.

The table layer itself is conformance-swept against a pure-Python model
in ``test_dml_hypothesis``; this sweep points the same generator at the
1.8k-LoC statement parser — the SQL path and the Python path run the
same sequence on twin tables and must agree row-for-row after every
statement.  What it catches is parser/translation drift: a mis-parsed
predicate, a clause routed to the wrong merge mode, an INSERT OVERWRITE
that appends.

Budgeted like its sibling: Spark commits are ~0.5 s, so few examples
and short sequences; failures shrink to a minimal statement list."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

KEYS = list(range(6))

_op = st.one_of(
    st.tuples(
        st.just("insert"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete"), st.sampled_from(KEYS)),
    st.tuples(st.just("update"), st.sampled_from(KEYS), st.integers(0, 99)),
    st.tuples(
        st.just("merge"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True),
        st.integers(0, 99),
    ),
    st.tuples(
        st.just("insert_overwrite"),
        st.lists(st.sampled_from(KEYS), min_size=1, max_size=2, unique=True),
    ),
    # roll back one version (guarded no-op at v0): RESTORE-then-DML
    # composition must behave identically through the SQL router
    st.tuples(st.just("restore")),
    # round-10: NOT IN subquery DML vs Catalyst's own literal NOT IN —
    # NULL keys exercise the three-valued zero-match short-circuit
    st.tuples(
        st.just("delete_not_in"),
        st.lists(st.sampled_from(KEYS) | st.none(), min_size=1, max_size=3),
    ),
    st.tuples(
        st.just("update_not_in"),
        st.lists(st.sampled_from(KEYS) | st.none(), min_size=1, max_size=3),
        st.integers(0, 99),
    ),
    # round-10: uncorrelated scalar subqueries in DML vs a twin that
    # pre-computes the scalar and runs the row-wise statement — the
    # fold must read the PRE-statement snapshot and the empty-table
    # NULL scalar must match nothing on both paths
    st.tuples(st.just("update_scalar"), st.sampled_from(KEYS)),
    st.tuples(st.just("delete_scalar")),
)


def _sql_key_list(keys) -> str:
    return ", ".join("(NULL)" if k is None else f"({k})" for k in keys)


def _lit_key_list(keys) -> str:
    return ", ".join("NULL" if k is None else str(k) for k in keys)


def _values(rows: list[tuple[int, int]]) -> str:
    return ", ".join(f"({k}, {v})" for k, v in rows)


def _apply_sql(lh: Lakehouse, op, seq: int) -> None:
    kind = op[0]
    if kind == "insert":
        lh.sql(f"INSERT INTO ta VALUES {_values([(k, seq) for k in op[1]])}")
    elif kind == "delete":
        lh.sql(f"DELETE FROM ta WHERE k = {op[1]}")
    elif kind == "update":
        lh.sql(f"UPDATE ta SET v = {op[2]} WHERE k = {op[1]}")
    elif kind == "merge":
        src = _values([(k, op[2]) for k in op[1]])
        lh.sql(
            "MERGE INTO ta AS t USING "
            f"(SELECT col1 AS k, col2 AS v FROM VALUES {src}) AS s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"
        )
    elif kind == "insert_overwrite":
        lh.sql(
            "INSERT OVERWRITE ta VALUES "
            f"{_values([(k, seq) for k in op[1]])}"
        )
    elif kind == "delete_not_in":
        lh.sql(
            "DELETE FROM ta WHERE k NOT IN "
            f"(SELECT col1 FROM VALUES {_sql_key_list(op[1])})"
        )
    elif kind == "update_not_in":
        lh.sql(
            f"UPDATE ta SET v = {op[2]} WHERE k NOT IN "
            f"(SELECT col1 FROM VALUES {_sql_key_list(op[1])})"
        )
    elif kind == "update_scalar":
        lh.sql(
            "UPDATE ta SET v = (SELECT CAST(MAX(v) + 1 AS INT) FROM ta) "
            f"WHERE k = {op[1]}"
        )
    elif kind == "delete_scalar":
        lh.sql("DELETE FROM ta WHERE v < (SELECT AVG(v) FROM ta)")
    elif kind == "restore":
        v = lh.table("ta").latest_version()
        if v >= 1:
            lh.sql(f"RESTORE TABLE ta TO VERSION AS OF {v - 1}")


def _apply_py(spark, t: ParquetTable, op, seq: int) -> None:
    kind = op[0]
    if kind == "insert":
        t.append(
            spark.createDataFrame([(k, seq) for k in op[1]], "k int, v int")
        )
    elif kind == "delete":
        t.delete(f"k = {op[1]}")
    elif kind == "update":
        t.update(f"k = {op[1]}", {"v": F.lit(op[2])})
    elif kind == "merge":
        t.merge(
            spark.createDataFrame(
                [(k, op[2]) for k in op[1]], "k int, v int"
            ),
            on=["k"],
        )
    elif kind == "insert_overwrite":
        t.overwrite(
            spark.createDataFrame([(k, seq) for k in op[1]], "k int, v int")
        )
    elif kind == "delete_not_in":
        # independent row-wise twin: Catalyst evaluates the literal
        # NOT IN list, IS TRUE mirrors DELETE's keep-UNKNOWN contract
        t.delete(F.expr(f"(k NOT IN ({_lit_key_list(op[1])})) IS TRUE"))
    elif kind == "update_not_in":
        t.update(
            F.expr(f"(k NOT IN ({_lit_key_list(op[1])})) IS TRUE"),
            {"v": F.lit(op[2])},
        )
    elif kind == "update_scalar":
        mx = t.read().agg(F.max("v")).collect()[0][0]  # pre-statement
        t.update(
            f"k = {op[1]}",
            {"v": F.lit(None if mx is None else mx + 1).cast("int")},
        )
    elif kind == "delete_scalar":
        av = t.read().agg(F.avg("v")).collect()[0][0]
        lit = (
            "CAST(NULL AS DOUBLE)" if av is None else f"CAST({av!r} AS DOUBLE)"
        )
        t.delete(F.expr(f"(v < {lit}) IS TRUE"))
    elif kind == "restore":
        v = t.latest_version()
        if v >= 1:
            t.restore(v - 1)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_sql_statements_match_python_api(spark, tmp_path_factory, ops):
    base = tmp_path_factory.mktemp("sqlhyp")
    init = spark.createDataFrame([(k, -1) for k in KEYS[:3]], "k int, v int")
    ta = ParquetTable.create(spark, str(base / "ta"), init)
    tb = ParquetTable.create(spark, str(base / "tb"), init)
    lh = Lakehouse(spark)
    lh.register("ta", str(base / "ta"))
    for seq, op in enumerate(ops):
        _apply_sql(lh, op, seq)
        _apply_py(spark, tb, op, seq)
        sql_rows = sorted((r.k, r.v) for r in ta.read().collect())
        py_rows = sorted((r.k, r.v) for r in tb.read().collect())
        assert sql_rows == py_rows, f"after {op} (step {seq} of {ops})"
    # both paths wrote the same commit KINDS in the same order too —
    # the SQL router must not reach the same rows via a different op
    # (an INSERT routed through overwrite would still pass row equality)
    ops_a = [c.operation for c in ta.history()]
    ops_b = [c.operation for c in tb.history()]
    assert ops_a == ops_b, f"history diverged for {ops}"


_keys_list = st.lists(
    st.sampled_from(KEYS), min_size=1, max_size=3, unique=True
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pre=st.lists(_op, min_size=0, max_size=2),
    victims=_keys_list,
    post=st.lists(_op, min_size=0, max_size=2),
)
def test_subquery_delete_matches_rowwise_delete(
    spark, tmp_path_factory, pre, victims, post
):
    """Two INDEPENDENT delete implementations must agree under random
    composition: `DELETE WHERE k IN (SELECT ...)` routes through the
    delete-only MERGE, while the Python twin runs the classic row-wise
    `delete(isin(...))` probe — different rewrite machinery, same rows.
    Histories may legitimately differ (MERGE vs DELETE commits), so
    only row state is compared."""
    base = tmp_path_factory.mktemp("sqldel")
    init = spark.createDataFrame([(k, -1) for k in KEYS[:3]], "k int, v int")
    ta = ParquetTable.create(spark, str(base / "ta"), init)
    tb = ParquetTable.create(spark, str(base / "tb"), init)
    lh = Lakehouse(spark)
    lh.register("ta", str(base / "ta"))

    def _step(op, seq):
        _apply_sql(lh, op, seq)
        _apply_py(spark, tb, op, seq)

    for seq, op in enumerate(pre):
        _step(op, seq)
    vals = ", ".join(f"({k})" for k in victims)
    lh.sql(f"DELETE FROM ta WHERE k IN (SELECT col1 FROM VALUES {vals})")
    tb.delete(F.col("k").isin(list(victims)))
    sql_rows = sorted((r.k, r.v) for r in ta.read().collect())
    py_rows = sorted((r.k, r.v) for r in tb.read().collect())
    assert sql_rows == py_rows, f"after deleting {victims} (pre={pre})"
    for seq, op in enumerate(post, start=len(pre)):
        _step(op, seq)
        sql_rows = sorted((r.k, r.v) for r in ta.read().collect())
        py_rows = sorted((r.k, r.v) for r in tb.read().collect())
        assert sql_rows == py_rows, f"after {op} (victims={victims})"


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pre=st.lists(_op, min_size=0, max_size=2),
    victims=_keys_list,
    delta=st.integers(1, 9),
    post=st.lists(_op, min_size=0, max_size=2),
)
def test_subquery_update_matches_rowwise_update(
    spark, tmp_path_factory, pre, victims, delta, post
):
    """The UPDATE twin of the subquery-DELETE sweep (round-8 verdict
    item 2): `UPDATE SET v = v + d WHERE k IN (SELECT ...)` routes
    through the update-only MERGE, while the Python twin runs the
    classic row-wise `update(isin(...))` rewrite — different machinery,
    same rows.  The SET reads the PRE-update row (v = v + d), so any
    group-collapse, double-application, or dropped duplicate diverges.
    Histories may legitimately differ (MERGE vs UPDATE commits), so
    only row state is compared."""
    base = tmp_path_factory.mktemp("sqlupd")
    init = spark.createDataFrame([(k, -1) for k in KEYS[:3]], "k int, v int")
    ta = ParquetTable.create(spark, str(base / "ta"), init)
    tb = ParquetTable.create(spark, str(base / "tb"), init)
    lh = Lakehouse(spark)
    lh.register("ta", str(base / "ta"))

    def _step(op, seq):
        _apply_sql(lh, op, seq)
        _apply_py(spark, tb, op, seq)

    for seq, op in enumerate(pre):
        _step(op, seq)
    vals = ", ".join(f"({k})" for k in victims)
    lh.sql(
        f"UPDATE ta SET v = v + {delta} "
        f"WHERE k IN (SELECT col1 FROM VALUES {vals})"
    )
    tb.update(F.col("k").isin(list(victims)), {"v": F.col("v") + delta})
    sql_rows = sorted((r.k, r.v) for r in ta.read().collect())
    py_rows = sorted((r.k, r.v) for r in tb.read().collect())
    assert sql_rows == py_rows, f"after updating {victims} (pre={pre})"
    for seq, op in enumerate(post, start=len(pre)):
        _step(op, seq)
        sql_rows = sorted((r.k, r.v) for r in ta.read().collect())
        py_rows = sorted((r.k, r.v) for r in tb.read().collect())
        assert sql_rows == py_rows, f"after {op} (victims={victims})"


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    extra=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-1, 3)),
        min_size=0,
        max_size=3,
    ),
    victims=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-1, 3)),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    delta=st.integers(1, 9),
)
def test_tuple_subquery_dml_matches_rowwise(
    spark, tmp_path_factory, extra, victims, delta
):
    """Tuple-IN twin sweep: `(k, v) IN (SELECT ...)` DELETE and UPDATE
    route through composite-key MERGE rewrites, while the Python twin
    runs row-wise predicates built from the same pairs — different
    machinery, same rows.  The UPDATE sets a THIRD column (membership
    components are unassignable by design); extra appended rows create
    duplicate-key groups so partial matches (right k, wrong v) and
    dup-tuple targets all occur."""
    import functools

    base = tmp_path_factory.mktemp("sqltup")
    rows = [(k, -1, 0) for k in KEYS[:4]] + [
        (k, v, 0) for k, v in extra
    ]
    init = spark.createDataFrame(rows, "k int, v int, w int")
    ta = ParquetTable.create(spark, str(base / "ta"), init)
    tb = ParquetTable.create(spark, str(base / "tb"), init)
    lh = Lakehouse(spark)
    lh.register("ta", str(base / "ta"))

    def rowwise(pairs):
        return functools.reduce(
            lambda a, b: a | b,
            [(F.col("k") == k) & (F.col("v") == v) for k, v in pairs],
        )

    vals = ", ".join(f"({k}, {v})" for k, v in victims)
    lh.sql(
        f"UPDATE ta SET w = w + {delta} "
        f"WHERE (k, v) IN (SELECT col1, col2 FROM VALUES {vals})"
    )
    tb.update(rowwise(victims), {"w": F.col("w") + delta})
    assert sorted(map(tuple, ta.read().collect())) == sorted(
        map(tuple, tb.read().collect())
    ), f"update diverged for {victims} (extra={extra})"
    lh.sql(
        f"DELETE FROM ta WHERE (k, v) IN (SELECT col1, col2 FROM VALUES {vals})"
    )
    tb.delete(rowwise(victims))
    assert sorted(map(tuple, ta.read().collect())) == sorted(
        map(tuple, tb.read().collect())
    ), f"delete diverged for {victims} (extra={extra})"
