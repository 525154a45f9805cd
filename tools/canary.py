"""Standalone box-health probe: the SAME two canaries bench.py runs
(pure-CPU codegen aggregate + one-table parquet scan), printed as one
JSON line.  Run this BEFORE launching a full bench to avoid burning a
20-minute run on a degraded box (the sandbox oscillates between healthy
and 1.5-8x degraded for hours — PERF.md, rounds 9-13).

Usage: python tools/canary.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_lakehouse_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("canary", master=f"local[{cpus}]")
    bench.canary_probes(spark, sf_dir)  # warm the codegen/scan path once
    probes = [bench.canary_probes(spark, sf_dir) for _ in range(3)]
    factors = [round(bench.probe_factor(p), 3) for p in probes]
    print(
        json.dumps(
            {
                "probes": probes,
                "factors": factors,
                "min_factor": min(factors),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
