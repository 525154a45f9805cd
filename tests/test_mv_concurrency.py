"""Concurrent REFRESH MATERIALIZED VIEW interleavings (round 12,
verdict #7) — the MV twin of ``test_concurrency``'s deterministic
stale-snapshot DML matrix.

The dangerous interleaving is refresh-vs-refresh: both read the same
stored cursor (``mv_dep_version``), both fold the same CDF delta, and
the second landing would DOUBLE-APPLY it onto state the first already
folded.  The engine re-reads the cursor at landing time
(``Lakehouse._mv_guard_cursor``) and raises the typed
:class:`ConcurrentModificationError` instead; re-running REFRESH folds
from the new cursor and converges.

Determinism: the loser's ``_mv_guard_cursor`` is wrapped so the winner
refreshes (through a SECOND Lakehouse over the same warehouse —
catalog persisted) at exactly the landing instant — no thread-timing
lottery, the conflict fires on every run.

Refresh-vs-base-DML is NOT a conflict by design: base DML never moves
the MV cursor, so a refresh that pinned ``cur`` lands its consistent
state for dep..cur and the next refresh folds the late commits — the
third test pins that contract.
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import (
    ConcurrentModificationError,
)


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


def _rows(lh, q):
    return sorted((tuple(r) for r in lh.sql(q).collect()), key=str)


def _interleave(loser: Lakehouse, winner_action):
    """Wrap the loser's landing-time cursor guard so ``winner_action``
    runs at exactly the landing instant — after the loser computed its
    delta from the (now-stale) cursor, before it commits."""
    orig = loser._mv_guard_cursor
    state = {"fired": False}

    def hook(table, dep):
        if not state["fired"]:
            state["fired"] = True
            winner_action()
        orig(table, dep)

    loser._mv_guard_cursor = hook
    return state


def test_refresh_vs_refresh_grouped_raises_typed(spark, wh):
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql(
        "CREATE TABLE b AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (1, 20), (2, 5), (3, 7)"
    )
    q = "SELECT g, SUM(x) AS sx, COUNT(*) AS n FROM b GROUP BY g"
    lh.sql(f"CREATE MATERIALIZED VIEW m AS {q}")
    lh.sql("INSERT INTO b VALUES (1, 100), (4, 1)")
    lh2 = Lakehouse(spark, warehouse=wh)  # the concurrent winner
    st = _interleave(lh, lambda: lh2.sql("REFRESH MATERIALIZED VIEW m"))
    with pytest.raises(ConcurrentModificationError, match="cursor moved"):
        lh.sql("REFRESH MATERIALIZED VIEW m")
    assert st["fired"]
    # the winner's state landed once; the loser double-applied nothing
    assert _rows(lh, "SELECT * FROM m") == _rows(lh, q)
    # retrying the loser folds from the NEW cursor: a clean noop
    r = lh.sql("REFRESH MATERIALIZED VIEW m").collect()[0]
    assert r.mode == "noop"
    assert _rows(lh, "SELECT * FROM m") == _rows(lh, q)


def test_refresh_vs_refresh_window_raises_typed(spark, wh):
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql(
        "CREATE TABLE c AS SELECT col1 AS k, col2 AS seq FROM VALUES "
        "(1, 1), (1, 2), (2, 1)"
    )
    q = (
        "SELECT k, seq FROM c QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY seq DESC) = 1"
    )
    lh.sql(f"CREATE MATERIALIZED VIEW w AS {q}")
    lh.sql("INSERT INTO c VALUES (1, 9), (3, 5)")
    lh2 = Lakehouse(spark, warehouse=wh)
    _interleave(lh, lambda: lh2.sql("REFRESH MATERIALIZED VIEW w"))
    with pytest.raises(ConcurrentModificationError, match="cursor moved"):
        lh.sql("REFRESH MATERIALIZED VIEW w")
    assert _rows(lh, "SELECT * FROM w") == _rows(lh, q)
    r = lh.sql("REFRESH MATERIALIZED VIEW w").collect()[0]
    assert r.mode in ("noop", "incremental")
    assert _rows(lh, "SELECT * FROM w") == _rows(lh, q)


def test_refresh_vs_refresh_append_projection_raises_typed(spark, wh):
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql(
        "CREATE TABLE p AS SELECT col1 AS k, col2 AS x FROM VALUES "
        "(1, 10), (2, 5)"
    )
    q = "SELECT k, x * 2 AS x2 FROM p WHERE x > 1"
    lh.sql(f"CREATE MATERIALIZED VIEW mp AS {q}")
    lh.sql("INSERT INTO p VALUES (3, 9)")
    lh2 = Lakehouse(spark, warehouse=wh)
    _interleave(lh, lambda: lh2.sql("REFRESH MATERIALIZED VIEW mp"))
    # without the guard this append-only path would append the new
    # rows TWICE (the winner already appended them)
    with pytest.raises(ConcurrentModificationError, match="cursor moved"):
        lh.sql("REFRESH MATERIALIZED VIEW mp")
    assert _rows(lh, "SELECT * FROM mp") == _rows(lh, q)
    r = lh.sql("REFRESH MATERIALIZED VIEW mp").collect()[0]
    assert r.mode == "noop"
    assert _rows(lh, "SELECT * FROM mp") == _rows(lh, q)


def test_refresh_vs_base_dml_is_not_a_conflict(spark, wh):
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql(
        "CREATE TABLE bd AS SELECT col1 AS g, col2 AS x FROM VALUES "
        "(1, 10), (2, 5)"
    )
    q = "SELECT g, SUM(x) AS sx FROM bd GROUP BY g"
    lh.sql(f"CREATE MATERIALIZED VIEW md AS {q}")
    lh.sql("INSERT INTO bd VALUES (1, 100)")
    lh2 = Lakehouse(spark, warehouse=wh)
    # base DML lands AFTER this refresh computed its delta but BEFORE
    # its landing: NOT a conflict (the cursor is untouched) — the
    # refresh lands its pinned-window state and the NEXT refresh folds
    # the late commit
    _interleave(lh, lambda: lh2.sql("INSERT INTO bd VALUES (2, 50)"))
    r = lh.sql("REFRESH MATERIALIZED VIEW md").collect()[0]
    assert r.mode == "incremental"
    # state is exact for the refresh's pinned window (late row absent)
    got = dict((t[0], t[1]) for t in _rows(lh, "SELECT * FROM md"))
    assert got[1] == 110 and got[2] == 5
    # converges on the next refresh
    r = lh.sql("REFRESH MATERIALIZED VIEW md").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lh, "SELECT * FROM md") == _rows(lh, q)


def test_refresh_vs_refresh_distinct_raises_typed(spark, wh):
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql(
        "CREATE TABLE dd AS SELECT col1 AS g FROM VALUES (1), (1), (2)"
    )
    q = "SELECT DISTINCT g FROM dd"
    lh.sql(f"CREATE MATERIALIZED VIEW mdd AS {q}")
    lh.sql("INSERT INTO dd VALUES (3)")
    lh.sql("DELETE FROM dd WHERE g = 2")
    lh2 = Lakehouse(spark, warehouse=wh)
    _interleave(lh, lambda: lh2.sql("REFRESH MATERIALIZED VIEW mdd"))
    with pytest.raises(ConcurrentModificationError, match="cursor moved"):
        lh.sql("REFRESH MATERIALIZED VIEW mdd")
    assert _rows(lh, "SELECT * FROM mdd") == _rows(lh, q)
    assert lh.sql("REFRESH MATERIALIZED VIEW mdd").collect()[0].mode == "noop"
