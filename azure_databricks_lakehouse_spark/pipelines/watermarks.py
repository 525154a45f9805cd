"""Watermark control table: high-water-mark incremental processing (ST1).

Reference parity: ``control.watermarks`` reads/writes at
``silver/silver_rx_claims_load.py:23,29-63`` — one row appended per run,
the current mark is the filtered max (A2).  Shared by the Silver load
(bronze ingestion_timestamp axis) and the Gold fact load
(silver_updated_timestamp axis); each consumer names its own
``table_name`` so marks never collide.

Scale: the mark lookup moves exactly one scalar to the driver; the
append is a single-row commit on the versioned table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.pipelines.paths import LakehousePaths
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table


def last_watermark(spark: SparkSession, paths: LakehousePaths, table: str):
    """Latest processed mark for ``table``; None means full load."""
    if not is_table(paths.watermarks):
        return None
    wm = ParquetTable.for_path(spark, paths.watermarks).read()
    return (
        wm.filter(F.col("table_name") == table)
        .agg(F.max("watermark_ts"))
        .first()[0]
    )


def append_watermark(
    spark: SparkSession, paths: LakehousePaths, table: str, ts
) -> None:
    row = spark.createDataFrame(
        [(table, ts)], "table_name STRING, watermark_ts TIMESTAMP"
    ).withColumn("updated_at", F.current_timestamp())
    if is_table(paths.watermarks):
        ParquetTable.for_path(spark, paths.watermarks).append(row)
    else:
        ParquetTable.create(spark, paths.watermarks, row)
