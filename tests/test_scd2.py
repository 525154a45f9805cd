"""SCD Type 2 operator tests: version-on-change, idempotent re-apply,
current/as-of views (``bronze_silver_gold/readme.md:56`` intent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.scd import (
    apply_scd2,
    as_of_view,
    current_view,
)
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "dim_member_scd2")


def _members(spark, rows):
    return spark.createDataFrame(rows, "member_id string, plan string, zip string")


def test_initial_load(spark, root):
    res = apply_scd2(
        spark,
        root,
        _members(spark, [("M1", "PPO", "10001"), ("M2", "HMO", "10002")]),
        "member_id",
        ["plan", "zip"],
        as_of="2024-01-01 00:00:00",
    )
    assert res == {"inserted": 2, "versioned": 0, "unchanged": 0}
    assert current_view(spark, root).count() == 2


def test_change_versions_and_preserves_history(spark, root):
    apply_scd2(
        spark, root,
        _members(spark, [("M1", "PPO", "10001"), ("M2", "HMO", "10002")]),
        "member_id", ["plan", "zip"], as_of="2024-01-01 00:00:00",
    )
    res = apply_scd2(
        spark, root,
        _members(spark, [("M1", "EPO", "10001"), ("M2", "HMO", "10002"), ("M3", "PPO", "10003")]),
        "member_id", ["plan", "zip"], as_of="2024-06-01 00:00:00",
    )
    assert res == {"inserted": 1, "versioned": 1, "unchanged": 1}

    dim = ParquetTable.for_path(spark, root).read()
    m1 = {
        (r["plan"], r["is_current"]): r
        for r in dim.filter(F.col("member_id") == "M1").collect()
    }
    assert set(m1) == {("PPO", False), ("EPO", True)}
    assert str(m1[("PPO", False)]["effective_to"]).startswith("2024-06-01")

    cur = {r["member_id"]: r["plan"] for r in current_view(spark, root).collect()}
    assert cur == {"M1": "EPO", "M2": "HMO", "M3": "PPO"}

    # business-time travel: in March, M1 was still PPO and M3 absent
    march = {
        r["member_id"]: r["plan"]
        for r in as_of_view(spark, root, "2024-03-01 00:00:00").collect()
    }
    assert march == {"M1": "PPO", "M2": "HMO"}


def test_reapply_is_noop(spark, root):
    batch = _members(spark, [("M1", "PPO", "10001")])
    apply_scd2(spark, root, batch, "member_id", ["plan", "zip"], "2024-01-01 00:00:00")
    res = apply_scd2(
        spark, root, batch, "member_id", ["plan", "zip"], "2024-06-01 00:00:00"
    )
    assert res == {"inserted": 0, "versioned": 0, "unchanged": 1}
    assert ParquetTable.for_path(spark, root).read().count() == 1


def test_null_safe_change_detection(spark, root):
    apply_scd2(
        spark, root, _members(spark, [("M1", None, "10001")]),
        "member_id", ["plan", "zip"], "2024-01-01 00:00:00",
    )
    # null -> null is NOT a change
    res = apply_scd2(
        spark, root, _members(spark, [("M1", None, "10001")]),
        "member_id", ["plan", "zip"], "2024-02-01 00:00:00",
    )
    assert res["versioned"] == 0
    # null -> value IS a change
    res = apply_scd2(
        spark, root, _members(spark, [("M1", "PPO", "10001")]),
        "member_id", ["plan", "zip"], "2024-03-01 00:00:00",
    )
    assert res["versioned"] == 1


def test_duplicate_batch_rejected(spark, root):
    batch = _members(spark, [("M1", "PPO", "10001"), ("M1", "EPO", "10002")])
    with pytest.raises(ValueError, match="duplicate member_id"):
        apply_scd2(spark, root, batch, "member_id", ["plan", "zip"], "2024-01-01 00:00:00")
