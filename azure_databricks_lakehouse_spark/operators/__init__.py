from azure_databricks_lakehouse_spark.operators.dedup import keep_latest, latest_by
from azure_databricks_lakehouse_spark.operators.dims import (
    add_surrogate_key,
    build_date_dim,
    date_key_expr,
    month_name_expr,
)
from azure_databricks_lakehouse_spark.operators.dq import (
    Rule,
    apply_rules,
    completeness,
    split_by_status,
)

__all__ = [
    "Rule",
    "apply_rules",
    "completeness",
    "split_by_status",
    "keep_latest",
    "latest_by",
    "add_surrogate_key",
    "build_date_dim",
    "date_key_expr",
    "month_name_expr",
]
