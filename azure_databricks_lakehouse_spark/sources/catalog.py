"""Test-corpus catalog: the driver's TPC-H-ish parquet tables.

Reference parity: catalog-table scans (S4, ``spark.table`` at
``silver/silver_rx_claims_load.py:35``) and path scans (S3).  Here the
"catalog" is the driver-generated parquet directory; ``register_views``
makes every table SQL-visible the way the reference registers Delta paths
with ``CREATE TABLE ... USING DELTA LOCATION`` (S9,
``bronze/bronze_rx_claims_load.py:77``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one corpus table; Catalyst prunes/pushes into it."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
