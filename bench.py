"""Benchmark harness: run the full query corpus at the bench scale factor.

Prints ONE JSON line:
    {"metric": "corpus_total", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[...] parallelism (default 32)

Each query is built and fully executed (collect-free count of a
``collect()`` would under-measure result materialization; we collect and
discard).  Per-query wall time includes plan build + execution — the same
thing a user pays.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_databricks_lakehouse_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench", master=f"local[{cpus}]")
    qs = entrymod.queries()

    # Warm the JVM/codegen path once so fixed startup cost doesn't land on
    # the first measured query.
    next(iter(qs.values()))(spark, sf_dir).collect()

    load_start = os.getloadavg()

    per_query: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).collect()
            per_query[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - record and continue
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]

    # Drift sentinel (round-8 bench hygiene): re-time the first 3 queries
    # at the END of the run.  If the box got noisy mid-run, the warm
    # re-probe diverges from the original timing and the artifact itself
    # carries the evidence — BENCH_r07 shipped 1.45x load-inflated and
    # only out-of-band archaeology proved it phantom.
    reprobe: dict[str, float] = {}
    for name in list(per_query)[:3]:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).collect()
            reprobe[name] = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001 - sentinel only, never fails the run
            pass

    out = {
        "metric": "corpus_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "warm_reprobe": reprobe,
    }
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
