"""Lakehouse table-operation queries: MERGE upsert + time travel under the
oracle gate.

These exercise the parquet-native table layer (``sources/tables.py``) end
to end with real writes: the Spark side materializes a table in a scratch
directory, runs the operation, and returns the resulting snapshot; the
DuckDB oracle computes the equivalent relational result (MERGE =
anti-join + union-all; time travel = the original version's defining
query).  This is how the reference's signature operation — the idempotent
``whenMatchedUpdateAll().whenNotMatchedInsertAll()`` fact refresh
(``gold/gold_rx_claims_load.py:216-221``) — gets a correctness row.

Determinism: target/source are carved from ``orders`` by modular
arithmetic; the updated measure is plain double arithmetic (IEEE —
bit-identical in both engines; only double→decimal *casts* diverge, see
``functions/numeric.py``).

Scratch tables live under ``/tmp`` keyed by scale factor and are wiped at
the start of each call, so repeated runs are self-cleaning and
re-entrant.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

_SCRATCH = "/tmp/lakehouse_scratch"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(_SCRATCH, tag, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def _target(orders: DataFrame) -> DataFrame:
    """Stale fact snapshot: orders not divisible by 4."""
    return orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )


def _source(orders: DataFrame) -> DataFrame:
    """Refresh batch: even order keys, repriced +10%, status U."""
    return orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("o_totalprice") * 1.1).alias("total"),
    )


_TARGET_SQL = """
SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total
FROM orders WHERE o_orderkey % 4 <> 0
"""
_SOURCE_SQL = """
SELECT o_orderkey, 'U' AS status, o_totalprice * 1.1 AS total
FROM orders WHERE o_orderkey % 2 = 0
"""


# --- q19: MERGE upsert (D3) — matched rows updated, new rows inserted ------
def q19_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "orders")
    root = _scratch(sf_dir, "merge_upsert")
    tbl = ParquetTable.create(spark, root, _target(t["orders"]))
    tbl.merge(_source(t["orders"]), on=["o_orderkey"])
    # Idempotency guarantee: the second identical merge must not change
    # the result (bronze_silver_gold/readme.md:68-70) — the oracle would
    # catch any drift.
    tbl.merge(_source(t["orders"]), on=["o_orderkey"])
    return tbl.read()


_Q19_SQL = f"""
WITH target AS ({_TARGET_SQL}), source AS ({_SOURCE_SQL})
SELECT t.* FROM target t ANTI JOIN source s USING (o_orderkey)
UNION ALL
SELECT * FROM source
"""


# --- q20: time travel (D5) — versioned snapshot read after overwrite -------
def q20_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "orders")
    root = _scratch(sf_dir, "time_travel")
    tbl = ParquetTable.create(spark, root, _target(t["orders"]))
    tbl.overwrite(_source(t["orders"]))  # v1 replaces everything
    return tbl.read(version=0)  # but v0 is still fully readable


_Q20_SQL = _TARGET_SQL


# --- q39: CSV round-trip scan (S1 header schema + S2 PERMISSIVE capture) ---
def q39_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lands the region table as CSV, re-reads it with an explicit schema
    in PERMISSIVE mode with a corrupt-record side column (the Bronze
    ingest contract, ``bronze/bronze_rx_claims_load.py:37-42``), and
    returns the parsed rows — the oracle reads the same data straight
    from parquet, so the CSV writer/parser round-trip (quoting, escapes,
    header) is what's being verified."""
    t = bind(spark, sf_dir, "region")
    root = _scratch(sf_dir, "csv_scan")
    t["region"].write.option("header", "true").mode("overwrite").csv(root)
    parsed = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("r_regionkey INT, r_name STRING, _corrupt_record STRING")
        .csv(root)
    )
    return parsed.filter(F.col("_corrupt_record").isNull()).select(
        "r_regionkey", "r_name"
    )


_Q39_SQL = "SELECT r_regionkey, r_name FROM region"


# --- q42: JSON scan (S12 other-format sources) -----------------------------
def q42_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lands nation as JSON-lines and re-reads it with an explicit schema
    (S12, ``bronze/bronze_rx_claims_load.py:36`` documents JSON landing
    sources).  Explicit schema, as at Bronze: inference on JSON is a
    whole extra pass over 100 TB."""
    t = bind(spark, sf_dir, "nation")
    root = _scratch(sf_dir, "json_scan")
    t["nation"].write.mode("overwrite").json(root)
    return spark.read.schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).json(root)


_Q42_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


QUERIES: dict[str, QuerySpec] = {
    "q19_merge_upsert": QuerySpec(q19_merge_upsert, _Q19_SQL),
    "q20_time_travel": QuerySpec(q20_time_travel, _Q20_SQL),
    "q39_csv_scan": QuerySpec(q39_csv_scan, _Q39_SQL),
    "q42_json_scan": QuerySpec(q42_json_scan, _Q42_SQL),
}
