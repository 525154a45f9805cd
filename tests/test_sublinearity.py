"""Wall-time sublinearity on many-file tables (round-7 verdict item 3).

`test_sidecars.py` proved the metadata SIZES are change-bounded; this
module converts the remaining 100×-scale claims from design argument to
measurement: a selective scan, a merge-on-read DV delete, and detail()
against a 3000-file table must cost far less than 30× their 100-file
cost — the driver-side work is manifest-parse + prune (∝ file list, one
small JSON) and the executor-side work is the pruned file set (∝ the
CHANGE), so the observed ratio should sit near 1×, bounded here at 5×
with best-of-3 timings to shrug off box noise.
"""

from __future__ import annotations

import time

import pytest

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

from tests.test_sidecars import N_FILES, _fabricate_table

N_SMALL = 100


def _best_of(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    small_root = str(tmp_path_factory.mktemp("sub") / "small")
    big_root = str(tmp_path_factory.mktemp("sub") / "big")
    _fabricate_table(small_root, N_SMALL)
    _fabricate_table(big_root, N_FILES)
    return (
        ParquetTable.for_path(spark, small_root),
        ParquetTable.for_path(spark, big_root),
    )


def _assert_sublinear(label: str, t_small: float, t_big: float):
    ratio = t_big / max(t_small, 1e-3)
    linear = N_FILES / N_SMALL  # 30×
    assert ratio < 5.0, (
        f"{label}: {t_big:.3f}s on {N_FILES} files vs {t_small:.3f}s on "
        f"{N_SMALL} ({ratio:.1f}×; linear would be {linear:.0f}×)"
    )


def test_selective_scan_is_sublinear(pair):
    small, big = pair
    pred = "k BETWEEN 100 AND 104"  # prunes to ≤2 files on either table
    small.scan_where(pred).collect()  # JVM/codegen warm-up
    big.scan_where(pred).collect()
    t_small = _best_of(lambda: small.scan_where(pred).collect())
    t_big = _best_of(lambda: big.scan_where(pred).collect())
    _assert_sublinear("scan_where", t_small, t_big)


def _best_of_thunks(*thunks) -> float:
    """Best wall-time across DISTINCT thunks (stateful DML can't rerun
    the same predicate — the second run would no-op-commit)."""
    best = float("inf")
    for fn in thunks:
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def test_dv_delete_is_sublinear(pair):
    small, big = pair
    # Warm-up commit first: the SESSION'S first DV-DML pays a one-time
    # JIT/codegen + plan-cache cost (profiled at 4-10s on either table
    # size; warm deletes are ~0.7s on BOTH 100 and 3000 files, with the
    # only O(files) driver component being the 0.1s manifest prune).
    # That per-session constant is not the scale claim under test — the
    # round-7 in-suite flake was exactly this n=1 cold measurement
    # inheriting accumulated session state.
    small.delete("k = 95 AND part = 9", mode="merge-on-read")
    big.delete("k = 95 AND part = 9", mode="merge-on-read")
    # one matching row inside one partition per delete; the probe is
    # partition+stats pruned, the commit adds a KB-sized DV.  Distinct
    # keys per round; best-of-2 shrugs off box noise.
    t_small = _best_of_thunks(
        lambda: small.delete("k = 105 AND part = 10", mode="merge-on-read"),
        lambda: small.delete("k = 125 AND part = 12", mode="merge-on-read"),
    )
    t_big = _best_of_thunks(
        lambda: big.delete("k = 105 AND part = 10", mode="merge-on-read"),
        lambda: big.delete("k = 125 AND part = 12", mode="merge-on-read"),
    )
    _assert_sublinear("merge-on-read delete", t_small, t_big)
    assert big.read().filter("k = 105").count() == 0


def test_detail_is_bounded(pair):
    """detail() is pure driver-side metadata — no data file is ever
    opened — so at 100 vs 3000 files both timings are sub-10ms and a
    ratio would only measure the (tiny, unavoidable) O(file-list) JSON
    parse.  The scale claim worth asserting is absolute: thousands of
    files stay in the milliseconds regime, nowhere near a file-open."""
    small, big = pair
    small.detail()
    big.detail()
    t_big = _best_of(lambda: big.detail())
    assert t_big < 0.25, f"detail() on {N_FILES} files took {t_big:.3f}s"
