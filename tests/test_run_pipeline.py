"""Orchestrator smoke test: the one-command medallion run
(``pipelines/run.py``) over a tiny landing file."""

from __future__ import annotations

import os

from azure_databricks_lakehouse_spark.pipelines.run import run_all

_CSV = (
    "claim_id,member_id,provider_id,service_date,received_date,"
    "procedure_code,diagnosis_code,billed_amount,allowed_amount,"
    "paid_amount,claim_line_number,place_of_service,claim_type\n"
    "C1,M1,P1,2024-01-10,2024-01-15,12345,D100,100.00,90.00,80.00,1,11,RX\n"
    "C2,,P1,2024-01-11,2024-01-15,12345,D100,50.00,40.00,30.00,1,11,RX\n"
)


def test_run_all(spark, tmp_path):
    landing = tmp_path / "landing" / "claims.csv"
    os.makedirs(landing.parent)
    landing.write_text(_CSV)

    members = tmp_path / "members.parquet"
    providers = tmp_path / "providers.parquet"
    spark.createDataFrame(
        [("M1", "A", "B", "1990-01-01", "F", "10001", "PPO")],
        "member_id string, first_name string, last_name string, "
        "date_of_birth string, gender string, zip_code string, plan_type string",
    ).write.parquet(str(members))
    spark.createDataFrame(
        [("P1", "Prov", "1", "Pharmacy", "Retail", "NY", "IN")],
        "provider_id string, provider_name string, npi string, specialty string, "
        "facility_type string, address_state string, network_status string",
    ).write.parquet(str(providers))

    stats = run_all(
        spark,
        str(tmp_path / "lake"),
        str(landing),
        members_path=str(members),
        providers_path=str(providers),
        date_dim_start="2024-01-01",
        date_dim_end="2024-12-31",
    )
    assert stats["bronze"] == {"n_rows": 2, "n_corrupt": 0}
    assert stats["silver"]["n_pass"] == 1 and stats["silver"]["n_fail"] == 1
    assert stats["gold"]["n_fact"] == 1


def test_run_all_requires_reference_tables(spark, tmp_path):
    import pytest

    landing = tmp_path / "landing" / "claims.csv"
    os.makedirs(landing.parent)
    landing.write_text(_CSV)
    with pytest.raises(ValueError, match="--members"):
        run_all(spark, str(tmp_path / "lake"), str(landing))
