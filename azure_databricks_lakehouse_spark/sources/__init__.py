from azure_databricks_lakehouse_spark.sources.catalog import (
    TABLES,
    bind,
    load_table,
    register_views,
)
from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

__all__ = [
    "TABLES",
    "bind",
    "load_table",
    "register_views",
    "Lakehouse",
    "ParquetTable",
    "is_table",
]
