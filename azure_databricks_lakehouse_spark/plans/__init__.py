from azure_databricks_lakehouse_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
)
from azure_databricks_lakehouse_spark.plans.cbo import (
    DEFAULT_BROADCAST_THRESHOLD,
    estimated_size,
    fresh_statistics,
    maybe_broadcast,
)

__all__ = [
    "physical_plan",
    "assert_no_cartesian",
    "assert_broadcast_join",
    "assert_pushed_filters",
    "DEFAULT_BROADCAST_THRESHOLD",
    "estimated_size",
    "fresh_statistics",
    "maybe_broadcast",
]
