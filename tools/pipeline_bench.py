"""Medallion pipeline benchmark at corpus scale.

Derives a claims CSV from the sf0.1 lineitem/orders tables (~600k claim
lines with seeded DQ failures and duplicate resends), then times
Bronze → Silver → Gold end to end through the orchestrator.  This is the
pipeline-shaped complement to ``bench.py``'s query corpus: it measures
the write path (CSV parse, DQ tagging, window dedup, MERGE, star join)
rather than read-side analytics.

    python tools/pipeline_bench.py [--sf-dir /root/testdata/sf0.1]

Prints one JSON line with per-stage seconds and row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_databricks_lakehouse_spark.pipelines import (  # noqa: E402
    LakehousePaths,
    bronze,
    gold,
    silver,
)
from azure_databricks_lakehouse_spark.session import get_spark  # noqa: E402


def _claims_csv(spark, sf_dir: str, out_dir: str) -> None:
    """Claims-shaped CSV derived from lineitem x orders (same seeding idea
    as queries/claims_dq.py, plus duplicate resends for the dedup stage)."""
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    sd = F.to_date("l_shipdate")
    base = j.select(
        F.concat(F.lit("C"), (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")).alias("claim_id"),
        F.when(F.col("o_custkey") % 89 == 0, None).otherwise(
            F.concat(F.lit("M"), F.col("o_custkey").cast("string"))
        ).alias("member_id"),
        F.concat(F.lit("P"), (F.col("l_suppkey") % 500).cast("string")).alias("provider_id"),
        sd.cast("string").alias("service_date"),
        F.date_add(sd, (F.col("l_suppkey") % 30).cast("int")).cast("string").alias("received_date"),
        F.when(
            F.col("l_partkey") % 17 == 0,
            F.concat(F.lit("bad"), (F.col("l_partkey") % 1000).cast("string")),
        ).otherwise(F.lpad((F.col("l_partkey") % 100000).cast("string"), 5, "0")).alias("procedure_code"),
        F.lit("D100").alias("diagnosis_code"),
        F.col("l_extendedprice").cast("string").alias("billed_amount"),
        (F.col("l_extendedprice") * 0.9).cast("decimal(18,2)").cast("string").alias("allowed_amount"),
        (F.col("l_extendedprice") * 0.8).cast("decimal(18,2)").cast("string").alias("paid_amount"),
        F.lit("1").alias("claim_line_number"),
        F.lit("11").alias("place_of_service"),
        F.lit("RX").alias("claim_type"),
    )
    resends = base.filter(F.col("claim_id").substr(-1, 1) == "1").withColumn(
        "received_date", F.date_add(F.to_date("received_date"), 5).cast("string")
    )
    base.unionByName(resends).write.option("header", "true").mode(
        "overwrite"
    ).csv(out_dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_spark("pipeline-bench", master=f"local[{args.cpus}]")
    work = tempfile.mkdtemp(prefix="pipeline_bench_")
    landing = os.path.join(work, "landing")
    lake = LakehousePaths(os.path.join(work, "lake"))
    stats: dict = {"sf_dir": args.sf_dir}
    try:
        t0 = time.time()
        _claims_csv(spark, args.sf_dir, landing)
        stats["gen_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        bres = bronze.ingest(
            spark, lake.bronze_claims, os.path.join(landing, "*.csv"), load_id="bench"
        )
        stats["bronze_sec"] = round(time.time() - t0, 2)
        stats["bronze_rows"] = bres.n_rows

        t0 = time.time()
        sres = silver.process(spark, lake)
        stats["silver_sec"] = round(time.time() - t0, 2)
        stats["silver_pass"] = sres.n_pass
        stats["silver_fail"] = sres.n_fail

        members = spark.createDataFrame(
            [(f"M{i}", "fn", "ln", "1990-01-01", "F", "10001", "PPO") for i in range(1, 2000)],
            "member_id string, first_name string, last_name string, "
            "date_of_birth string, gender string, zip_code string, plan_type string",
        )
        providers = spark.createDataFrame(
            [(f"P{i}", f"prov{i}", str(i), "Pharmacy", "Retail", "NY", "IN") for i in range(500)],
            "provider_id string, provider_name string, npi string, specialty string, "
            "facility_type string, address_state string, network_status string",
        )
        silver.load_reference_table(spark, members, lake.silver_members, ["member_id"])
        silver.load_reference_table(spark, providers, lake.silver_providers, ["provider_id"])

        t0 = time.time()
        gres = gold.build(spark, lake, "1995-01-01", "2002-12-31")
        stats["gold_sec"] = round(time.time() - t0, 2)
        stats["fact_rows"] = gres.n_fact

        stats["total_sec"] = round(
            stats["gen_sec"] + stats["bronze_sec"] + stats["silver_sec"] + stats["gold_sec"], 2
        )
        print(json.dumps(stats))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
