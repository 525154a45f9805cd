"""The audit's headline must agree with its own table (round-4 verdict:
positional indexing swapped the global-window and cartesian sums)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_audit import PlanCounts, summary_line  # noqa: E402


def test_summary_sums_the_right_columns():
    rows = [
        #          name  ex bhj bnlj arrow gwin cart py
        PlanCounts("q_a", 5, 1, 0, 0, 7, 2, 3),
        PlanCounts("q_b", 1, 0, 1, 2, 9, 4, 5),
    ]
    line = summary_line(rows)
    assert "Queries: 2" in line
    assert "cartesian products: 6" in line  # 2 + 4, NOT the gwin sum 16
    assert "row-at-a-time Python: 8" in line  # 3 + 5
