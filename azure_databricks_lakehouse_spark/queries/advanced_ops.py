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


# --- q35: bounded range join (event pairs within 60 s, same user) ----------
def q35_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate self-join: Catalyst plans the user_id
    equi-key as the join key and evaluates the time-band as a join
    condition — one key shuffle, no cartesian.  The 60 s band bounds the
    per-key output; at 100 TB you would additionally bucket by coarse
    time (join on (user, epoch div 60) ± 1) to bound the per-key compare
    set — unnecessary at this density."""
    t = bind(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_epoch")
    )
    a, b = ev.alias("a"), ev.alias("b")
    gap = F.col("b.ts_epoch") - F.col("a.ts_epoch")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (gap >= -60)
            & (gap <= 60),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            gap.alias("gap_s"),
        )
    )


_Q35_SQL = """
WITH ev AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
)
SELECT a.user_id AS user_id,
       a.event_id AS event_a,
       b.event_id AS event_b,
       b.ts_epoch - a.ts_epoch AS gap_s
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts_epoch - a.ts_epoch BETWEEN -60 AND 60
"""


# --- q44: analytic windows + exact percentiles (merged q44 + q45) ----------
def q44_window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window family beyond W1's row_number (SURVEY.md §2.6
    lists frames/lag/lead as absent from the reference) PLUS exact
    grouped percentiles — merged from the former q44_window_analytics and
    q45_percentiles so the whole corpus fits the driver's 50-query
    correctness budget (round-3 verdict item 1).

    Per-customer windows: order sequence (row_number), gap-to-previous
    (lag), next-order lookahead (lead), an exact running spend (decimal
    sum over a rows frame), value dense_rank, and spend quartiles
    (ntile).  All six share ONE customer-key shuffle; Catalyst stacks the
    window operators over a single Exchange+Sort.  The grouped tail then
    checks every window column in aggregate (integer sums / max — exact
    cross-engine) alongside exact percentiles of o_totalprice
    (sort-based, linear interpolation, bit-identical to DuckDB's
    quantile_cont).  Exact percentile is a full sort per group; at 100 TB
    prefer approx_percentile's KLL/GK sketch unless the contract demands
    exactness.

    Determinism: all window orderings are total (tie-broken by
    o_orderkey), so lag/lead/rank/ntile are engine-independent; the
    running spend stays decimal until the final grouped sum (exact at any
    accumulation order) and is cast to double only at the end."""
    t = bind(spark, sf_dir, "orders")
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("od"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    seq = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    frame = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("price").desc(), "o_orderkey"
    )
    windowed = o.select(
        "o_orderpriority",
        F.col("price").cast("double").alias("totalprice"),
        F.row_number().over(seq).alias("order_seq"),
        F.datediff(F.col("od"), F.lag("od").over(seq)).alias("days_since_prev"),
        F.lead("o_orderkey").over(seq).alias("next_orderkey"),
        F.sum("price").over(frame).alias("running_spend"),
        F.dense_rank().over(by_price).alias("spend_rank"),
        F.ntile(4).over(by_price).alias("spend_quartile"),
    )
    return windowed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("totalprice", F.lit(0.99)).alias("p99"),
        F.sum("order_seq").alias("sum_seq"),
        F.sum("days_since_prev").alias("sum_gap_days"),
        F.sum("next_orderkey").alias("sum_next_key"),
        F.sum("running_spend").cast("double").alias("sum_running_spend"),
        F.max("spend_rank").alias("max_spend_rank"),
        F.sum("spend_quartile").alias("sum_quartile"),
    )


_Q44_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         CAST(o_orderdate AS DATE) AS od,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
windowed AS (
  SELECT o_orderpriority,
         CAST(price AS DOUBLE) AS totalprice,
         row_number() OVER seq AS order_seq,
         date_diff('day', lag(od) OVER seq, od) AS days_since_prev,
         lead(o_orderkey) OVER seq AS next_orderkey,
         SUM(price) OVER (
           PARTITION BY o_custkey ORDER BY od, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running_spend,
         dense_rank() OVER by_price AS spend_rank,
         ntile(4) OVER by_price AS spend_quartile
  FROM o
  WINDOW seq AS (PARTITION BY o_custkey ORDER BY od, o_orderkey),
         by_price AS (PARTITION BY o_custkey ORDER BY price DESC, o_orderkey)
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       quantile_cont(totalprice, 0.5) AS p50,
       quantile_cont(totalprice, 0.9) AS p90,
       quantile_cont(totalprice, 0.99) AS p99,
       CAST(SUM(order_seq) AS BIGINT) AS sum_seq,
       CAST(SUM(days_since_prev) AS BIGINT) AS sum_gap_days,
       CAST(SUM(next_orderkey) AS BIGINT) AS sum_next_key,
       CAST(SUM(running_spend) AS DOUBLE) AS sum_running_spend,
       CAST(MAX(spend_rank) AS BIGINT) AS max_spend_rank,
       CAST(SUM(spend_quartile) AS BIGINT) AS sum_quartile
FROM windowed
GROUP BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "q33_grouping_sets": QuerySpec(q33_grouping_sets, _Q33_SQL),
    "q34_asof_join": QuerySpec(q34_asof_join, _Q34_SQL),
    "q35_range_join": QuerySpec(q35_range_join, _Q35_SQL),
    "q44_window_percentiles": QuerySpec(q44_window_percentiles, _Q44_SQL),
}


# --- q50: correlated scalar subquery, decorrelated -------------------------
def q50_decorrelated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems whose quantity is below 20% of their
    part's average quantity — the classic *correlated scalar subquery*,
    decorrelated the way an optimizer would: the per-part average becomes
    a grouped aggregate joined back on the correlation key, and the
    part-attribute filter is pushed through the aggregate first (the
    average per part is unchanged by a filter on part attributes, so both
    the probe and the aggregate run over ~1% of lineitem instead of all
    of it).  The DuckDB oracle runs the *actual* correlated subquery, so
    the rewrite is verified against first-class subquery semantics.

    Determinism: l_quantity is integral, so AVG is exact in double at any
    partitioning/accumulation order; the 0.2× bound is therefore
    bit-identical in both engines and the < comparison cannot flap.
    Money is summed in exact decimal (functions/numeric.dec_sum)."""
    from azure_databricks_lakehouse_spark.functions.numeric import dec_sum

    t = bind(spark, sf_dir, "lineitem", "part")
    brand = t["part"].filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    lib = (
        t["lineitem"]
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    bounds = lib.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_bound")
    )
    return (
        lib.join(bounds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_bound"))
        .agg(
            dec_sum("l_extendedprice").alias("sum_below_bound"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _q50_sql() -> str:
    from azure_databricks_lakehouse_spark.functions.numeric import dec_sum_sql

    return f"""
SELECT {dec_sum_sql('l_extendedprice')} AS sum_below_bound,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
WHERE l.l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


QUERIES["q50_decorrelated_subquery"] = QuerySpec(q50_decorrelated_subquery, _q50_sql())
