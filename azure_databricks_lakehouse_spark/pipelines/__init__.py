"""Medallion pipeline compositions (Bronze → Silver → Gold).

Reference parity for the three entry-point scripts
(``bronze/bronze_rx_claims_load.py``, ``silver/silver_rx_claims_load.py``,
``gold/gold_rx_claims_load.py``), rebuilt as a reusable library over the
engine's operator modules and the parquet-native table layer.
"""

from azure_databricks_lakehouse_spark.pipelines.paths import LakehousePaths

__all__ = ["LakehousePaths"]
