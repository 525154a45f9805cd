"""PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``azure-databricks-lakehouse`` reference (medallion Bronze/Silver/Gold
pipeline, declarative DQ rules, keep-latest dedup, star-schema assembly,
watermark incremental processing, MERGE upserts), built idiomatically on
Spark DataFrame/SQL/Catalyst — no UDFs in the core, no custom execution
engine — and extended with large-scale training-data pipeline operators
(dedup, similarity search, text analysis).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame API,
let Catalyst/AQE pick physical strategy; broadcast small dimensions;
partition by date; never collect in a data path.
"""

from azure_databricks_lakehouse_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
