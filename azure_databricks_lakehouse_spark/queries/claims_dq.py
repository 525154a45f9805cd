"""Placeholder — populated in a later milestone."""

from azure_databricks_lakehouse_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
