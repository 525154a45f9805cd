"""The reference's medallion notebook flow driven ENTIRELY through the
SQL front-end — the switch-over proof: a user of the reference's
Databricks notebooks can run the same statement shapes here.

Flow mirrored (statement-for-statement where the reference uses SQL,
SQL-equivalents where it uses the DataFrame/DeltaTable API):
bronze CSV landing -> COPY INTO bronze (idempotent ingestion,
`bronze/bronze_rx_claims_load.py:38-66` re-read + append) -> CREATE
TABLE ... USING DELTA LOCATION registration (`:77`) -> silver
dedup-to-latest + DQ-tag CTAS (`silver/silver_rx_claims_load.py`) ->
gold fact MERGE with updateAll/insertAll
(`gold/gold_rx_claims_load.py:216-221`) -> OPTIMIZE / VACUUM / DESCRIBE
HISTORY maintenance (`bronze_silver_gold/readme.md:96-109`).
"""

from __future__ import annotations

import os

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


def _land(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        fh.write("claim_id,member_id,amount,status,service_date\n")
        for r in rows:
            fh.write(",".join(str(x) for x in r) + "\n")


def test_medallion_flow_in_sql(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    land = str(tmp_path / "landing")

    # --- bronze: create empty table, COPY INTO from landing -------------
    lh.sql(
        "CREATE TABLE bronze.rx_claims ("
        "  claim_id int, member_id int, amount double,"
        "  status string, service_date string"
        ") USING DELTA"
    )
    _land(land, "day1.csv", [
        (1, 100, 50.0, "APPROVED", "2024-01-01"),
        (2, 101, 75.0, "PENDING", "2024-01-01"),
        (2, 101, 80.0, "APPROVED", "2024-01-02"),  # later version of claim 2
        (3, 102, -5.0, "APPROVED", "2024-01-02"),  # DQ offender
    ])
    opts = "FORMAT_OPTIONS('header'='true', 'inferSchema'='true')"
    r1 = lh.sql(
        f"COPY INTO bronze.rx_claims FROM '{land}' FILEFORMAT = CSV {opts}"
    ).collect()[0]
    assert r1.num_rows_loaded == 4
    # rerunning the ingestion cell is free (the reference re-reads all)
    assert lh.sql(
        f"COPY INTO bronze.rx_claims FROM '{land}' FILEFORMAT = CSV {opts}"
    ).collect()[0].num_files_loaded == 0

    # --- silver: dedup-to-latest + DQ tags as CTAS ----------------------
    lh.sql(
        "CREATE TABLE silver.rx_claims USING DELTA AS "
        "WITH ranked AS ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY claim_id ORDER BY service_date DESC"
        "  ) AS rn FROM bronze.rx_claims"
        ") "
        "SELECT claim_id, member_id, amount, status, service_date, "
        "       amount > 0 AS dq_amount_ok "
        "FROM ranked WHERE rn = 1"
    )
    silver = {
        r.claim_id: r
        for r in lh.sql("SELECT * FROM silver.rx_claims").collect()
    }
    assert set(silver) == {1, 2, 3}
    assert silver[2].amount == 80.0  # latest version won
    assert silver[3].dq_amount_ok is False

    # --- gold: fact MERGE (the reference's updateAll/insertAll shape) ---
    lh.sql(
        "CREATE TABLE gold.fact_claim USING DELTA AS "
        "SELECT claim_id, member_id, amount, status FROM silver.rx_claims "
        "WHERE dq_amount_ok"
    )
    # day 2: claim 1 re-adjudicated, claim 4 arrives
    spark.createDataFrame(
        [(1, 100, 55.0, "ADJUSTED"), (4, 103, 20.0, "APPROVED")],
        "claim_id int, member_id int, amount double, status string",
    ).createOrReplaceTempView("silver_increment")
    lh.sql(
        "MERGE INTO gold.fact_claim AS target USING silver_increment AS source "
        "ON target.claim_id = source.claim_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    fact = {
        r.claim_id: (r.amount, r.status)
        for r in lh.sql("SELECT * FROM gold.fact_claim").collect()
    }
    assert fact == {1: (55.0, "ADJUSTED"), 2: (80.0, "APPROVED"),
                    4: (20.0, "APPROVED")}

    # --- maintenance (readme.md:96-109) ---------------------------------
    lh.sql("OPTIMIZE gold.fact_claim")
    ops = [
        r.operation
        for r in lh.sql("DESCRIBE HISTORY gold.fact_claim").collect()
    ]
    assert ops[-1] == "CREATE" and "MERGE" in ops
    # time travel back to the pre-merge fact table still works
    pre = lh.sql(
        "SELECT count(*) AS n FROM gold.fact_claim VERSION AS OF 0"
    ).collect()[0].n
    assert pre == 2
    # VACUUM collapses the horizon to the current snapshot
    lh.sql("VACUUM gold.fact_claim RETAIN 0 HOURS")
    assert {
        r.claim_id for r in lh.sql("SELECT * FROM gold.fact_claim").collect()
    } == {1, 2, 4}
