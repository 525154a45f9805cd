from azure_databricks_lakehouse_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
)

__all__ = [
    "physical_plan",
    "assert_no_cartesian",
    "assert_broadcast_join",
    "assert_pushed_filters",
]
