"""Column profiling operator (``operators/profile``) — the Databricks
data-profile / ``dbutils.data.summarize`` surface.

Values are verified against exact recomputation; the plan contract
(one aggregate pass for scalars, one stacked shuffle for top values)
is pinned by job-free plan inspection: the profile frame contains
exactly ONE Aggregate over the source, and top_values exactly one
Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.profile import (
    profile,
    top_values,
)


@pytest.fixture()
def df(spark):
    rows = [
        (1, 10.0, "aa", None),
        (2, 20.0, "bbb", "x"),
        (3, None, "aa", "y"),
        (4, 40.0, None, "x"),
        (4, 50.0, "cc", "x"),
    ]
    return spark.createDataFrame(rows, "k int, v double, s string, t string")


def _metrics(pf):
    return {(r.column, r.metric): r.value for r in pf.collect()}


def test_profile_scalar_metrics(df):
    m = _metrics(profile(df, quantiles=(0.5,)))
    assert m[("k", "count")] == "5"
    assert m[("k", "nulls")] == "0"
    assert m[("v", "count")] == "4"
    assert m[("v", "nulls")] == "1"
    assert m[("v", "min")] == "10.0"
    assert m[("v", "max")] == "50.0"
    assert m[("v", "mean")] == "30.0"
    assert m[("k", "approx_distinct")] == "4"  # exact at tiny cardinality
    assert m[("s", "min_len")] == "2"
    assert m[("s", "max_len")] == "3"
    assert ("s", "min") not in m  # strings profile lengths, not order
    assert float(m[("v", "q0.5")]) in (20.0, 40.0)  # approx median


def test_profile_column_subset_and_unknown(df):
    m = _metrics(profile(df, columns=["k"]))
    assert {c for c, _ in m} == {"k"}
    with pytest.raises(ValueError, match="unknown columns"):
        profile(df, columns=["zz"])


def test_profile_is_single_aggregate_pass(df):
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_top_values_ranks_and_excludes_nulls(df):
    tv = {
        (r.column, r.rank): (r.value, r.n)
        for r in top_values(df, columns=["s", "t"], k=2).collect()
    }
    assert tv[("s", 1)] == ("aa", 2)
    assert tv[("s", 2)] in (("bbb", 1), ("cc", 1))  # tie broken by value
    assert tv[("s", 2)] == ("bbb", 1)  # ascending value tiebreak
    assert tv[("t", 1)] == ("x", 3)
    assert tv[("t", 2)] == ("y", 1)
    assert len(tv) == 4  # no NULL rows counted as values


def test_top_values_one_shuffle(df):
    plan = (
        top_values(df, columns=["s", "t"], k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Exchange for the stacked aggregate + the window's own
    # partitioning reuses it (same key): at most 2, never per-column
    assert plan.count("Exchange") <= 2


def test_top_values_k_validation(df):
    with pytest.raises(ValueError, match="k must be"):
        top_values(df, k=0)
