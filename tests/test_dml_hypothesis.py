"""Property-based DML conformance: random operation sequences against a
pure-Python reference model.

Every example drives the SAME random sequence of append / delete /
update / merge / overwrite operations into (a) a ParquetTable and (b) a
dict-based reference implementing textbook SQL semantics, then asserts
the table read matches the model EXACTLY — rows, not just counts.  This
is the complement of the example-based suites: those pin known edge
cases; this sweeps the composition space (delete-after-merge,
update-into-DV-masked-files, merge-into-overwritten-table, ...) where
hand-written cases run out.

Spark commits are ~0.5 s each, so the sweep is budgeted: few examples,
short sequences, deadline disabled.  Failures shrink to a minimal op
sequence — paste it into a regular test when one is found.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

KEYS = list(range(8))  # small key domain forces op interactions

_mode = st.sampled_from(["auto", "merge-on-read", "copy-on-write"])
_op = st.one_of(
    st.tuples(st.just("append"), st.lists(st.sampled_from(KEYS), min_size=1, max_size=3)),
    st.tuples(st.just("delete"), st.sampled_from(KEYS), _mode),
    st.tuples(st.just("update"), st.sampled_from(KEYS), st.integers(0, 99), _mode),
    st.tuples(st.just("merge"), st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True), st.integers(0, 99)),
    st.tuples(st.just("overwrite"), st.lists(st.sampled_from(KEYS), min_size=0, max_size=2, unique=True)),
)


def _apply_model(model: dict, op, seq: int):
    kind = op[0]
    if kind == "append":
        for k in op[1]:
            model.setdefault(k, []).append(seq)
    elif kind == "delete":
        model.pop(op[1], None)
    elif kind == "update":
        if op[1] in model:
            model[op[1]] = [op[2]] * len(model[op[1]])
    elif kind == "merge":
        for k in op[1]:
            model[k] = [op[2]]  # whole-row replace; insert when absent
    elif kind == "overwrite":
        model.clear()
        for k in op[1]:
            model[k] = [seq]


def _apply_table(spark, t: ParquetTable, op, seq: int) -> None:
    if op[0] == "append":
        t.append(
            spark.createDataFrame([(k, seq) for k in op[1]], "k int, v int")
        )
    elif op[0] == "delete":
        t.delete(f"k = {op[1]}", mode=op[2])
    elif op[0] == "update":
        t.update(f"k = {op[1]}", {"v": F.lit(op[2])}, mode=op[3])
    elif op[0] == "merge":
        # duplicate-target-match impossible: keys unique in the source
        t.merge(
            spark.createDataFrame(
                [(k, op[2]) for k in op[1]], "k int, v int"
            ),
            on=["k"],
        )
    elif op[0] == "overwrite":
        df = spark.createDataFrame(
            [(k, seq) for k in op[1]], "k int, v int"
        )
        t.overwrite(df)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_random_dml_sequences_match_reference_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("hyp") / "t")
    t = ParquetTable.create(
        spark,
        root,
        spark.createDataFrame([(k, -1) for k in KEYS[:3]], "k int, v int"),
    )
    model: dict[int, list[int]] = {k: [-1] for k in KEYS[:3]}
    for seq, op in enumerate(ops):
        _apply_table(spark, t, op, seq)
        _apply_model(model, op, seq)
        got: dict[int, list[int]] = {}
        for r in t.read().collect():
            got.setdefault(r.k, []).append(r.v)
        want = {k: sorted(vs) for k, vs in model.items() if vs}
        have = {k: sorted(vs) for k, vs in got.items()}
        assert have == want, f"after {op} (step {seq} of {ops})"
    # time-travel isolation: version 0 still reads the initial snapshot
    # no matter which DML sequence followed it
    v0 = {(r.k, r.v) for r in t.read(version=0).collect()}
    assert v0 == {(k, -1) for k in KEYS[:3]}
