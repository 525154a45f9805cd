"""Round-10 SQL-surface query: column profiling + the materialized-view
refresh lifecycle in ONE long-format tagged union under the DuckDB
oracle (the QUALIFY clause lands in q11's tagged union — see
``queries/relational.py``).

Round 10 added user-facing surfaces that previously had only unit
tests; this query puts two of them under the driver's value-hash gate
without growing the corpus past the 50-query budget:

- **Column profiling** (``part='profile'``): the ``dbutils.data.
  summarize`` / data-profile surface (``operators/profile.py``) — one
  aggregate pass computes every per-column stat.  The oracle is the
  long-format UNION ALL of the equivalent scalar aggregates; only
  metrics with engine-independent string renderings participate (exact
  counts, integer extrema, string lengths — approx sketches and float
  means are unit-tested in tests/test_profile.py instead, their
  renderings are engine-specific).
- **Materialized view** (``part='mv'``): CREATE MATERIALIZED VIEW →
  mixed DML on the base table (INSERT + UPDATE + DELETE in one refresh
  window) → CDF-driven incremental REFRESH → read.  The oracle
  recomputes the defining aggregate from the equivalent relational
  state, so the signed-weight delta fold (``sources/mv.py``) answers to
  DuckDB, not just to a recompute by the same engine.
- **Star-join materialized view** (``part='mvjoin'``, round 11): the
  reference's gold aggregation-table shape — an aggregate over
  fact ⋈ dim (gold_rx_claims_load.py:237-245 joins rx claims to
  dim_date) — maintained INCREMENTALLY under the same fact DML window
  (``sources/mv.py`` join canonicalization: with dims frozen,
  Δ(fact ⋈ dims) = Δfact ⋈ dims).  The ``_refresh/mode`` row pins
  ``incremental`` in the oracle artifact itself: a silent fall-back to
  full recompute would hash-mismatch, not just slow down.
- **DISTINCT materialized view** (``part='mvdistinct'``, round 11):
  ``SELECT DISTINCT`` maintained as a zero-aggregate group state —
  same mode pin, key set checked against the relational DISTINCT.
- **Round-12 MV shapes**, each with its own mode pin over a second
  small fact's DML window: ``part='mvwin'`` window-over-join (top
  order per customer through a dim join — scoped per-key rescan
  against pinned dims, checked against DuckDB's native window),
  ``part='mvrid'`` projection-over-join keyed by the row-tracked
  fact's stable row id (WHERE boundary crossed both ways by the
  +100000 bump), ``part='mvhavg'`` HAVING with a HIDDEN AVG (the two
  ``%2`` groups' averages are engineered ~100k apart, so the 200000
  threshold is SF-robust).

Both parts render as ``(part, item, metric, value)`` with ``value``
stringified; money stays DECIMAL through every step (cast from the raw
double ONCE, scales chosen so no later cast ever rounds — see
``functions/numeric.py`` on why casting derived doubles diverges).

Scale notes: the profile is ONE scan regardless of column count; the
MV refresh reads only the CDF window of the three DMLs — at 100 TB the
refresh cost is proportional to the changed files, never the base
table (``sources/mv.py`` delta-state design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.profile import profile
from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.queries.lakehouse_ops import _scratch
from azure_databricks_lakehouse_spark.sources.catalog import bind
from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

# metrics whose string rendering is engine-independent: exact integer
# counts/extrema and string lengths (see module doc).
_PROFILE_METRICS = ("count", "nulls", "min", "max", "min_len", "max_len")
_PROFILE_COLS = ("doc_id", "n_chars", "lang", "source")

# base = orders not divisible by 4 (decimal money from the start); the
# DML batch inserts the ÷4 complement repriced ×1.1, bumps ÷10=3 totals,
# and deletes ÷10=7 — insert + update + delete all land in ONE refresh
# window, exercising group birth, mutation, and the signed-weight fold.
# DECIMAL(21,3): price has 2 decimals, ×1.1 yields exactly 3, so no cast
# in the whole lifecycle ever rounds.
_MV_QUERY = (
    "SELECT status, SUM(total) AS total_sum, COUNT(*) AS n_orders, "
    "COUNT(total) AS n_priced FROM fact GROUP BY status"
)

_MVJ_QUERY = (
    "SELECT dimc.seg AS seg, SUM(fact.total) AS total_sum, "
    "COUNT(*) AS n_orders FROM fact JOIN dimc "
    "ON fact.o_custkey = dimc.c_custkey GROUP BY dimc.seg"
)

_MVD_QUERY = "SELECT DISTINCT o_custkey % 500 AS ck FROM fact"

# round-12 shapes over a SECOND, small fact (÷16 slices keep the extra
# lifecycle cheap): window-over-join (fact-side partition key, scoped
# per-key rescan against pinned dims), rid-keyed projection-over-join
# (row-tracked fact), and HAVING with a HIDDEN AVG.  The ×1.1 insert
# slice plus the +100000 bump on even keys puts the two %2 groups'
# averages ~100k apart, so the 200000 HAVING threshold is robust at
# every SF (sample means vary by a few k, the gap is engineered).
_MVW_QUERY = (
    # mixed DIM+fact partition keys (round 12): d.seg is determined by
    # the equi-join key, so the rows equal the fact-key-only top-1 and
    # the oracle is unchanged — but the refresh now scopes through the
    # pinned dim (touched keys from CDF ⋈ dim, fact ⟕semi touched dim
    # rows), pinning the dim-side rescan path under the mode row
    "SELECT f.o_custkey AS ck, f.o_orderkey AS ok, d.seg AS seg "
    "FROM fact2 f JOIN dimc d ON f.o_custkey = d.c_custkey "
    "QUALIFY ROW_NUMBER() OVER (PARTITION BY d.seg, f.o_custkey "
    "ORDER BY f.total DESC, f.o_orderkey) = 1"
)
_MVR_QUERY = (
    "SELECT f.o_orderkey AS ok, f.total AS total, d.seg AS seg "
    "FROM fact2 f JOIN dimc d ON f.o_custkey = d.c_custkey "
    "WHERE f.total > 200000"
)
_MVH_QUERY = (
    "SELECT o_orderkey % 2 AS odd, COUNT(*) AS n, SUM(total) AS ts "
    "FROM fact2 GROUP BY o_orderkey % 2 HAVING AVG(total) > 200000"
)

_MV_SCRIPT = f"""
CREATE TABLE fact AS
  SELECT o_orderkey, o_custkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 4 <> 0;
CREATE TABLE dimc AS
  SELECT c_custkey, c_mktsegment AS seg FROM customer;
CREATE MATERIALIZED VIEW mv_status AS {_MV_QUERY};
CREATE MATERIALIZED VIEW mv_seg AS {_MVJ_QUERY};
CREATE MATERIALIZED VIEW mv_dk AS {_MVD_QUERY};
CREATE TABLE fact2 AS
  SELECT o_orderkey, o_custkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 16 = 1;
ALTER TABLE fact2 SET TBLPROPERTIES ('delta.enableRowTracking' = 'true');
CREATE MATERIALIZED VIEW mv_win AS {_MVW_QUERY};
CREATE MATERIALIZED VIEW mv_rid AS {_MVR_QUERY};
CREATE MATERIALIZED VIEW mv_havg AS {_MVH_QUERY};
INSERT INTO fact
  SELECT o_orderkey, o_custkey, 'U' AS status,
         CAST(o_totalprice AS DECIMAL(21,3)) * 1.1 AS total
  FROM orders WHERE o_orderkey % 4 = 0;
UPDATE fact SET total = total + 1 WHERE o_orderkey % 10 = 3;
DELETE FROM fact WHERE o_orderkey % 10 = 7;
INSERT INTO fact2
  SELECT o_orderkey, o_custkey, 'U' AS status,
         CAST(o_totalprice AS DECIMAL(21,3)) * 1.1 AS total
  FROM orders WHERE o_orderkey % 16 = 2;
UPDATE fact2 SET total = total + 100000 WHERE o_orderkey % 2 = 0;
DELETE FROM fact2 WHERE o_orderkey % 5 = 2;
REFRESH MATERIALIZED VIEW mv_status
"""


def q56_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "documents", "orders", "customer")

    prof = (
        profile(t["documents"], columns=list(_PROFILE_COLS))
        .filter(F.col("metric").isin(*_PROFILE_METRICS))
        .select(
            F.lit("profile").alias("part"),
            F.col("column").alias("item"),
            "metric",
            "value",
        )
    )

    wh = _scratch(sf_dir, "mv_warehouse")
    lh = Lakehouse(spark, warehouse=wh)
    lh.sql_script(_MV_SCRIPT)
    mv_wide = lh.sql(
        "SELECT status, CAST(total_sum AS DECIMAL(38,3)) AS total_sum, "
        "n_orders, n_priced FROM mv_status"
    )
    mv = mv_wide.select(
        F.lit("mv").alias("part"),
        F.col("status").alias("item"),
        F.explode(
            F.create_map(
                F.lit("total_sum"), F.col("total_sum").cast("string"),
                F.lit("n_orders"), F.col("n_orders").cast("string"),
                F.lit("n_priced"), F.col("n_priced").cast("string"),
            )
        ).alias("metric", "value"),
    )

    # DISTINCT MV (round 11): zero-aggregate grouped state — the mode
    # row pins incremental maintenance, the key rows pin the values
    dmode = lh.sql("REFRESH MATERIALIZED VIEW mv_dk").select(
        F.lit("mvdistinct").alias("part"),
        F.lit("_refresh").alias("item"),
        F.lit("mode").alias("metric"),
        F.col("mode").alias("value"),
    )
    mvd = lh.sql("SELECT ck FROM mv_dk").select(
        F.lit("mvdistinct").alias("part"),
        F.col("ck").cast("string").alias("item"),
        F.lit("distinct").alias("metric"),
        F.lit("1").alias("value"),
    )

    # round-12 MV shapes (see module doc): each refresh MODE is pinned
    # 'incremental' in the oracle, so a silent full-refresh fallback
    # hash-mismatches instead of just slowing down
    def _mode_row(view: str, part: str) -> DataFrame:
        return lh.sql(f"REFRESH MATERIALIZED VIEW {view}").select(
            F.lit(part).alias("part"),
            F.lit("_refresh").alias("item"),
            F.lit("mode").alias("metric"),
            F.col("mode").alias("value"),
        )

    wmode = _mode_row("mv_win", "mvwin")
    mvw = lh.sql("SELECT ck, ok, seg FROM mv_win").select(
        F.lit("mvwin").alias("part"),
        F.col("ck").cast("string").alias("item"),
        F.lit("top").alias("metric"),
        F.concat_ws("|", F.col("ok").cast("string"), "seg").alias("value"),
    )
    rmode = _mode_row("mv_rid", "mvrid")
    mvr = lh.sql("SELECT ok, total, seg FROM mv_rid").select(
        F.lit("mvrid").alias("part"),
        F.col("ok").cast("string").alias("item"),
        F.lit("row").alias("metric"),
        F.concat_ws(
            "|", "seg", F.col("total").cast("string")
        ).alias("value"),
    )
    # the join-MV refresh runs LAST among the refreshes, after a dim
    # UPDATE (the window/rid views above join the same dim and pinned
    # their incremental modes against its pre-move state), so mvjoin's
    # constant 'incremental' oracle row proves BOTH that a silent
    # full-refresh fallback hash-mismatches AND that the round-12
    # dim-delta legs fire for a moved dim instead of the old full
    # fallback
    lh.sql("UPDATE dimc SET seg = 'DX' WHERE c_custkey % 50 = 7")
    mode = lh.sql("REFRESH MATERIALIZED VIEW mv_seg").select(
        F.lit("mvjoin").alias("part"),
        F.lit("_refresh").alias("item"),
        F.lit("mode").alias("metric"),
        F.col("mode").alias("value"),
    )
    mvj = lh.sql(
        "SELECT seg, CAST(total_sum AS DECIMAL(38,3)) AS total_sum, "
        "n_orders FROM mv_seg"
    ).select(
        F.lit("mvjoin").alias("part"),
        F.col("seg").alias("item"),
        F.explode(
            F.create_map(
                F.lit("total_sum"), F.col("total_sum").cast("string"),
                F.lit("n_orders"), F.col("n_orders").cast("string"),
            )
        ).alias("metric", "value"),
    )
    hmode = _mode_row("mv_havg", "mvhavg")
    mvh = lh.sql(
        "SELECT odd, CAST(ts AS DECIMAL(38,3)) AS ts, n FROM mv_havg"
    ).select(
        F.lit("mvhavg").alias("part"),
        F.col("odd").cast("string").alias("item"),
        F.explode(
            F.create_map(
                F.lit("n"), F.col("n").cast("string"),
                F.lit("ts"), F.col("ts").cast("string"),
            )
        ).alias("metric", "value"),
    )
    return (
        prof.unionByName(mv)
        .unionByName(mode)
        .unionByName(mvj)
        .unionByName(dmode)
        .unionByName(mvd)
        .unionByName(wmode)
        .unionByName(mvw)
        .unionByName(rmode)
        .unionByName(mvr)
        .unionByName(hmode)
        .unionByName(mvh)
    )


def _profile_oracle() -> str:
    numeric = {"doc_id", "n_chars"}
    pieces = []
    for c in _PROFILE_COLS:
        pieces.append(
            f"SELECT 'profile' AS part, '{c}' AS item, 'count' AS metric, "
            f"CAST(COUNT({c}) AS VARCHAR) AS value FROM documents"
        )
        pieces.append(
            f"SELECT 'profile', '{c}', 'nulls', "
            f"CAST(COUNT(*) - COUNT({c}) AS VARCHAR) FROM documents"
        )
        if c in numeric:
            for m, fn in (("min", "MIN"), ("max", "MAX")):
                pieces.append(
                    f"SELECT 'profile', '{c}', '{m}', "
                    f"CAST({fn}({c}) AS VARCHAR) FROM documents"
                )
        else:
            for m, fn in (("min_len", "MIN"), ("max_len", "MAX")):
                pieces.append(
                    f"SELECT 'profile', '{c}', '{m}', "
                    f"CAST({fn}(LENGTH({c})) AS VARCHAR) FROM documents"
                )
    return "\nUNION ALL\n".join(pieces)


_Q56_SQL = f"""
WITH fact0 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 4 <> 0
  UNION ALL
  SELECT o_orderkey, o_custkey, 'U' AS status,
         CAST(CAST(o_totalprice AS DECIMAL(21,3)) * 1.1
              AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 4 = 0
),
fact AS (
  SELECT o_orderkey, o_custkey, status,
         CASE WHEN o_orderkey % 10 = 3
              THEN CAST(total + 1 AS DECIMAL(21,3)) ELSE total END AS total
  FROM fact0 WHERE o_orderkey % 10 <> 7
),
mv AS (
  SELECT status, CAST(SUM(total) AS DECIMAL(38,3)) AS total_sum,
         COUNT(*) AS n_orders, COUNT(total) AS n_priced
  FROM fact GROUP BY status
),
jmv AS (
  -- the Spark side moves dim rows (UPDATE dimc SET seg='DX' WHERE
  -- c_custkey % 50 = 7) before the final mvjoin refresh; the oracle
  -- rebuilds the post-move dim inline
  SELECT CASE WHEN c.c_custkey % 50 = 7 THEN 'DX'
              ELSE c.c_mktsegment END AS seg,
         CAST(SUM(f.total) AS DECIMAL(38,3)) AS total_sum,
         COUNT(*) AS n_orders
  FROM fact f JOIN customer c ON f.o_custkey = c.c_custkey
  GROUP BY 1
),
f2a AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 16 = 1
  UNION ALL
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(21,3)) * 1.1
              AS DECIMAL(21,3)) AS total
  FROM orders WHERE o_orderkey % 16 = 2
),
f2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 2 = 0
              THEN CAST(total + 100000 AS DECIMAL(21,3))
              ELSE total END AS total
  FROM f2a WHERE o_orderkey % 5 <> 2
),
wtop AS (
  SELECT ck, ok, seg FROM (
    SELECT f.o_custkey AS ck, f.o_orderkey AS ok,
           c.c_mktsegment AS seg,
           ROW_NUMBER() OVER (PARTITION BY f.o_custkey
                              ORDER BY f.total DESC, f.o_orderkey) AS rn
    FROM f2 f JOIN customer c ON f.o_custkey = c.c_custkey
  ) WHERE rn = 1
),
ridrows AS (
  SELECT f.o_orderkey AS ok, f.total AS total, c.c_mktsegment AS seg
  FROM f2 f JOIN customer c ON f.o_custkey = c.c_custkey
  WHERE f.total > 200000
),
havg AS (
  SELECT o_orderkey % 2 AS odd, COUNT(*) AS n,
         CAST(SUM(total) AS DECIMAL(38,3)) AS ts
  FROM f2 GROUP BY o_orderkey % 2 HAVING AVG(total) > 200000
)
{_profile_oracle()}
UNION ALL
SELECT 'mv', status, 'total_sum', CAST(total_sum AS VARCHAR) FROM mv
UNION ALL
SELECT 'mv', status, 'n_orders', CAST(n_orders AS VARCHAR) FROM mv
UNION ALL
SELECT 'mv', status, 'n_priced', CAST(n_priced AS VARCHAR) FROM mv
UNION ALL
SELECT 'mvjoin', '_refresh', 'mode', 'incremental'
UNION ALL
SELECT 'mvjoin', seg, 'total_sum', CAST(total_sum AS VARCHAR) FROM jmv
UNION ALL
SELECT 'mvjoin', seg, 'n_orders', CAST(n_orders AS VARCHAR) FROM jmv
UNION ALL
SELECT 'mvdistinct', '_refresh', 'mode', 'incremental'
UNION ALL
SELECT DISTINCT 'mvdistinct', CAST(o_custkey % 500 AS VARCHAR),
       'distinct', '1'
FROM fact
UNION ALL
SELECT 'mvwin', '_refresh', 'mode', 'incremental'
UNION ALL
SELECT 'mvwin', CAST(ck AS VARCHAR), 'top',
       CAST(ok AS VARCHAR) || '|' || seg
FROM wtop
UNION ALL
SELECT 'mvrid', '_refresh', 'mode', 'incremental'
UNION ALL
SELECT 'mvrid', CAST(ok AS VARCHAR), 'row',
       seg || '|' || CAST(total AS VARCHAR)
FROM ridrows
UNION ALL
SELECT 'mvhavg', '_refresh', 'mode', 'incremental'
UNION ALL
SELECT 'mvhavg', CAST(odd AS VARCHAR), 'n', CAST(n AS VARCHAR) FROM havg
UNION ALL
SELECT 'mvhavg', CAST(odd AS VARCHAR), 'ts', CAST(ts AS VARCHAR) FROM havg
"""


QUERIES: dict[str, QuerySpec] = {
    "q56_sql_surface": QuerySpec(q56_sql_surface, _Q56_SQL),
}
