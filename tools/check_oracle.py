"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash.  Run this before every commit:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]

Bit-compatibility with the driver (round-2 lesson): the driver canonicalizes
each result with ``df[sorted(cols)].sort_values(by=cols)`` and hashes the
frame's *rendered* values with NO numeric coercion.  Two consequences this
replica now reproduces instead of papering over:

  1. list/ndarray-typed cells make ``sort_values`` raise
     ``TypeError: unhashable type: 'list'`` — we let that surface as a FAIL
     (queries must project arrays as joined strings);
  2. int64 ``123`` vs float64 ``123.0`` (DuckDB HUGEINT -> float64 via the
     pandas bridge) render differently and MUST mismatch — oracle SQL needs
     explicit ``CAST(... AS BIGINT)``.

The old value-normalizing comparison survives only as a diagnostic to print
the first differing row when the strict comparison fails.
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


def _canon_strict(df_pandas):
    """Driver-compatible canonical form: sorted columns, frame sorted over
    every column (raises TypeError on list-typed cells, exactly like the
    driver), values rendered without numeric coercion."""
    cols = sorted(df_pandas.columns)
    frame = df_pandas[cols].sort_values(by=cols, kind="mergesort")
    # csv rendering is dtype-sensitive: int64 123 -> "123", float64 -> "123.0"
    return cols, frame.to_csv(index=False)


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
        msg = []
        try:
            s_cols, s_csv = _canon_strict(spark_pd)
            d_cols, d_csv = _canon_strict(duck_pd)
        except TypeError as exc:
            msg.append(
                f"driver canonicalizer would crash (list-typed output column?): {exc}"
            )
        else:
            if s_cols != d_cols:
                msg.append(f"columns differ: spark={s_cols} duck={d_cols}")
            if len(spark_pd) != len(duck_pd):
                msg.append(
                    f"rowcount differs: spark={len(spark_pd)} duck={len(duck_pd)}"
                )
            if not msg and s_csv != d_csv:
                # strict hash mismatch — use the lenient diff for diagnosis
                s_rows = _normalize(spark_pd)[1]
                d_rows = _normalize(duck_pd)[1]
                detail = "values equal after coercion (dtype/rendering mismatch)"
                for a, b in zip(s_rows, d_rows):
                    if a != b:
                        detail = f"first differing row: spark={a!r} duck={b!r}"
                        break
                msg.append(f"strict hash mismatch; {detail}")
        if msg:
            print(f"FAIL  {name}: " + "; ".join(msg))
            failures.append(name)
        else:
            print(f"OK    {name} ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
