"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values.  Run this before every commit:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_lakehouse_spark.session import get_spark
from azure_databricks_lakehouse_spark.sources.catalog import TABLES

import __spark_entry__ as entrymod


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return _norm_cell(v.item())
    return v


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for tup in df_pandas[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in tup))
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        s_cols, s_rows = _normalize(spark_pd)
        d_cols, d_rows = _normalize(duck_pd)
        msg = []
        if s_cols != d_cols:
            msg.append(f"columns differ: spark={s_cols} duck={d_cols}")
        if len(s_rows) != len(d_rows):
            msg.append(f"rowcount differs: spark={len(s_rows)} duck={len(d_rows)}")
        if not msg and s_rows != d_rows:
            n_bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    msg.append(f"value mismatch ({n_bad} rows), first: spark={a!r} duck={b!r}")
                    break
        if msg:
            print(f"FAIL  {name}: " + "; ".join(msg))
            failures.append(name)
        else:
            print(f"OK    {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
