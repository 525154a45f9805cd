"""Physical-plan audits: make scale discipline testable.

The build contract for 100 TB is that plans — not just results — stay
correct: filters reach the parquet scan, small sides broadcast, and no
operator degenerates into a cartesian product or an unpartitioned global
window.  These helpers read the executed plan string (the same text
``df.explain()`` prints) so the test suite can pin the plan *shape* of
every headline query; a regression that keeps results right but breaks
the plan (e.g. a lost broadcast hint turning into a 100 TB shuffle) fails
CI instead of production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains a cartesian product:\n{plan}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """At least ``min_count`` broadcast joins (BHJ or broadcast NLJ with a
    deliberately broadcast side)."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < min_count:
        raise AssertionError(
            f"expected >= {min_count} broadcast joins, found {n}:\n{plan}"
        )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a scan's PushedFilters list."""
    plan = physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters: [" in line
    ]
    blob = "\n".join(pushed)
    for frag in fragments:
        if frag not in blob:
            raise AssertionError(
                f"filter {frag!r} not pushed to any scan; pushed lists:\n{blob}"
            )
