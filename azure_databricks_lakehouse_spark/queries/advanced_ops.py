"""Advanced relational extensions: grouping sets and as-of joins.

Neither exists in the reference (SURVEY.md §2.5 notes grouping
sets/cube as absent; §2.4 notes as-of joins as absent) — both are listed
extension surface, and both matter for the analytics the reference's
Gold layer feeds:

- **Grouping sets** (q33): multi-granularity aggregate tables in one
  pass — the idiomatic replacement for the reference's would-be family
  of separate aggregate tables (``gold/gold_rx_claims_load.py:237-245``);
  one shuffle produces detail + subtotal + grand-total rows.
- **As-of join** (q34): "latest prior event" attribution, implemented
  distributed via the union-sort trick: tag both sides, sort within the
  key partition by (ts, side-tag), and carry the last non-null left
  timestamp forward with an ``ignoreNulls`` window ``last`` — one
  key-shuffle total, no range explosion, no per-key driver loops.  The
  DuckDB oracle uses its native ``ASOF LEFT JOIN``, so the trick is
  verified against a first-class implementation.

The Spark side of q33 goes through ``spark.sql`` over the lazily-bound
temp views — exercising the SQL-visible catalog surface (S4/S9) that the
DataFrame corpus otherwise bypasses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind


# --- q33: grouping sets (detail + subtotal + total in one pass) ------------
def q33_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    bind(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        """
        WITH enriched AS (
          SELECT n_name AS nation,
                 year(o_orderdate) AS o_year,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT nation, o_year,
               CAST(grouping(nation) AS INT) * 2
                 + CAST(grouping(o_year) AS INT) AS gid,
               CAST(SUM(price) AS DOUBLE) AS total_price,
               COUNT(*) AS n_orders
        FROM enriched
        GROUP BY GROUPING SETS ((nation, o_year), (nation), ())
        """
    )


_Q33_SQL = """
WITH enriched AS (
  SELECT n_name AS nation,
         year(o_orderdate) AS o_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation, o_year,
       CAST(grouping(nation) AS INT) * 2 + CAST(grouping(o_year) AS INT) AS gid,
       CAST(SUM(price) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders
FROM enriched
GROUP BY GROUPING SETS ((nation, o_year), (nation), ())
"""


# --- q34: as-of join (latest prior click per error, union-sort trick) ------
def q34_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("ts_epoch")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_epoch").alias("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts_epoch").alias("click_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts_epoch").alias("ts"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("click_ts"),
    )
    # side=0 sorts clicks before same-timestamp errors, so an equal-ts
    # click is visible to the error (ASOF `>=` semantics).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(errors).withColumn(
        "asof_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("error_ts"),
        "asof_click_ts",
    )


_Q34_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
clicks AS (SELECT user_id, ts_epoch FROM ev WHERE event_type = 'click'),
errors AS (SELECT event_id, user_id, ts_epoch FROM ev WHERE event_type = 'error')
SELECT e.event_id,
       e.user_id,
       e.ts_epoch AS error_ts,
       c.ts_epoch AS asof_click_ts
FROM errors e
ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts_epoch >= c.ts_epoch
"""


QUERIES: dict[str, QuerySpec] = {
    "q33_grouping_sets": QuerySpec(q33_grouping_sets, _Q33_SQL),
    "q34_asof_join": QuerySpec(q34_asof_join, _Q34_SQL),
}
