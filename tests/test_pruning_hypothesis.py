"""Property-based soundness sweep for the file-pruning grammar.

``may_match`` has one contract: it may return False ONLY when no row of
the file can satisfy the predicate (plans/pruning module docstring).  A
violation silently loses rows from DELETE/UPDATE/scan_where — the worst
failure mode the table layer has — so the contract gets an adversarial
sweep, with DuckDB as the independent truth oracle:

  hypothesis generates random rows and a random predicate from the
  supported grammar; rows are grouped into "files" by the day part of
  their timestamp (hive-partition style); per file, DuckDB decides
  whether ANY row truly matches, and footer-style min/max stats are
  derived from the rows.  If DuckDB found a matching row, may_match
  MUST say True — for the raw predicate AND for the
  generated-column-augmented one (day GENERATED ALWAYS AS to_date(ts)),
  which exercises the implication rewrite's soundness too.

Pure driver-side (no Spark session): hundreds of examples run in
seconds.  Completeness (pruning enough) is pinned by the example-based
tests; this sweep is only about never pruning too much.
"""

from __future__ import annotations

import duckdb
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from azure_databricks_lakehouse_spark.plans.pruning import (
    augment_generated_partitions,
    may_match,
    parse_predicate,
)

_OPS = ["=", "!=", "<", "<=", ">", ">="]
_STRS = ["a", "b", "c", "ab"]
_DAYS = ["2026-08-10", "2026-08-11", "2026-08-12"]
_TIMES = ["00:00:00", "09:30:00", "23:59:59"]


def _ts(day: str, time: str) -> str:
    return f"{day} {time}"


_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 20)),
    st.one_of(st.none(), st.sampled_from(_STRS)),
    st.tuples(st.sampled_from(_DAYS), st.sampled_from(_TIMES)),
)

_leaf = st.one_of(
    st.tuples(st.just("k"), st.sampled_from(_OPS), st.integers(-2, 22)).map(
        lambda t: f"k {t[1]} {t[2]}"
    ),
    st.tuples(st.just("s"), st.sampled_from(_OPS), st.sampled_from(_STRS)).map(
        lambda t: f"s {t[1]} '{t[2]}'"
    ),
    st.tuples(
        st.sampled_from(_OPS),
        st.sampled_from(_DAYS),
        st.sampled_from(_TIMES),
    ).map(lambda t: f"ts {t[0]} '{_ts(t[1], t[2])}'"),
    st.lists(st.integers(0, 20), min_size=1, max_size=3).map(
        lambda xs: f"k IN ({', '.join(map(str, xs))})"
    ),
    st.tuples(
        st.sampled_from(_DAYS), st.sampled_from(_DAYS), st.sampled_from(_TIMES)
    ).map(
        lambda t: "ts BETWEEN "
        f"'{_ts(min(t[0], t[1]), '00:00:00')}' AND '{_ts(max(t[0], t[1]), t[2])}'"
    ),
    st.sampled_from(["k IS NULL", "k IS NOT NULL", "s IS NULL"]),
)


def _combine(children):
    a, b, conj = children
    return f"({a} {conj} {b})"


_pred = st.recursive(
    _leaf,
    lambda inner: st.tuples(
        inner, inner, st.sampled_from(["AND", "OR"])
    ).map(_combine),
    max_leaves=5,
)


@settings(max_examples=300, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=12), sql=_pred)
def test_may_match_never_prunes_a_true_match(rows, sql):
    pred = parse_predicate(sql)
    if pred is None:
        return  # unprunable shape: caller reads everything — trivially sound
    aug = augment_generated_partitions(
        pred, {"day": "to_date(ts)"}, ["day"]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE r (k INT, s VARCHAR, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO r VALUES (?, ?, ?)",
        [(k, s, _ts(*t)) for k, s, t in rows],
    )
    try:
        by_day = con.execute(
            f"SELECT CAST(ts AS DATE), count(*) FROM r WHERE {sql} GROUP BY 1"
        ).fetchall()
    except duckdb.InternalException:
        # DuckDB 1.0.0 optimizer bug, not ours: an OR of duplicated
        # `col IS NULL AND ts BETWEEN <timestamp literals>` branches
        # dies with "Attempted to dereference unique_ptr that is NULL".
        # The truth oracle is unavailable for this example — skip it;
        # the sweep stays sound over everything DuckDB can evaluate.
        assume(False)
    matched_days = {str(d) for d, n in by_day if n}
    for day in {t[0] for _, _, t in rows}:
        group = [(k, s, t) for k, s, t in rows if t[0] == day]
        stats = {}
        ks = [k for k, _, _ in group if k is not None]
        ss = [s for _, s, _ in group if s is not None]
        if ks:
            stats["k"] = [min(ks), max(ks)]
        if ss:
            stats["s"] = [min(ss), max(ss)]
        if day in matched_days:
            assert may_match(pred, stats, {"day": day}), (
                f"raw pruning lost a match: {sql!r} day={day} rows={group}"
            )
            assert may_match(aug, stats, {"day": day}), (
                f"generated augmentation lost a match: {sql!r} day={day} "
                f"rows={group}"
            )
