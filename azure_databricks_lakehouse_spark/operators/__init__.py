from azure_databricks_lakehouse_spark.operators.dedup import keep_latest
from azure_databricks_lakehouse_spark.operators.dq import Rule, apply_rules, split_by_status

__all__ = ["Rule", "apply_rules", "split_by_status", "keep_latest"]
