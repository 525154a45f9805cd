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

from azure_databricks_lakehouse_spark.functions.hashing import (
    md5_bucket,
    md5_bucket_sql,
)
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


# --- q36: deterministic hash split (train/val/test over documents) ---------
def q36_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data staple: a stable md5-bucket split — assignment
    depends only on the id (survives reshuffles, re-runs, and corpus
    growth), computed as a pure projection (no shuffle, no RNG state).
    Bucket = first md5 byte (0..255, functions/hashing.md5_bucket):
    <204 train (~80%), <230 val (~10%), else test."""
    t = bind(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    return t["documents"].select(
        "doc_id", bucket.alias("bucket"), split.alias("split")
    )


_Q36_SQL = f"""
WITH hashed AS (
  SELECT doc_id, {md5_bucket_sql('doc_id')} AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM hashed
"""


# --- q40: set operators (INTERSECT / EXCEPT cohort analysis) ---------------
def q40_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer retention cohorts via set algebra: INTERSECT (active in
    both years) and EXCEPT (churned after 1995).  Spark's
    ``intersect``/``subtract`` are the distinct set ops matching SQL
    INTERSECT/EXCEPT; each plans as an aggregate + join, not a full
    materialized distinct per side."""
    t = bind(spark, sf_dir, "orders")
    o = t["orders"].select(
        "o_custkey", F.year(F.to_date("o_orderdate")).alias("y")
    )
    y95 = o.filter(F.col("y") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.col("y") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select("o_custkey", F.lit("both").alias("cohort"))
    churned = y95.subtract(y96).select(
        "o_custkey", F.lit("only_1995").alias("cohort")
    )
    return both.unionByName(churned)


_Q40_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT o_custkey, 'both' AS cohort
FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'only_1995' AS cohort
FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
"""


# --- q44: analytic window breadth (lead/lag, dense_rank, ntile, frames) ----
def q44_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window family beyond W1's row_number (SURVEY.md §2.6
    lists frames/lag/lead as absent from the reference): per-customer
    order sequence with gap-to-previous, next-order lookahead, an exact
    running spend (decimal sum over a rows frame — order-insensitive
    cross-engine), value dense_rank, and spend quartiles.  All five share
    ONE customer-key shuffle; Catalyst stacks the window operators over a
    single Exchange+Sort."""
    t = bind(spark, sf_dir, "orders")
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    seq = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    frame = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("price").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(seq).alias("order_seq"),
        F.datediff(F.col("od"), F.lag("od").over(seq)).alias("days_since_prev"),
        F.lead("o_orderkey").over(seq).alias("next_orderkey"),
        F.sum("price").over(frame).cast("double").alias("running_spend"),
        F.dense_rank().over(by_price).alias("spend_rank"),
        F.ntile(4).over(by_price).alias("spend_quartile"),
    )


_Q44_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS od,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT o_custkey, o_orderkey,
       row_number() OVER seq AS order_seq,
       date_diff('day', lag(od) OVER seq, od) AS days_since_prev,
       lead(o_orderkey) OVER seq AS next_orderkey,
       CAST(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY od, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend,
       dense_rank() OVER by_price AS spend_rank,
       ntile(4) OVER by_price AS spend_quartile
FROM o
WINDOW seq AS (PARTITION BY o_custkey ORDER BY od, o_orderkey),
       by_price AS (PARTITION BY o_custkey ORDER BY price DESC, o_orderkey)
"""


QUERIES: dict[str, QuerySpec] = {
    "q33_grouping_sets": QuerySpec(q33_grouping_sets, _Q33_SQL),
    "q34_asof_join": QuerySpec(q34_asof_join, _Q34_SQL),
    "q35_range_join": QuerySpec(q35_range_join, _Q35_SQL),
    "q36_hash_split": QuerySpec(q36_hash_split, _Q36_SQL),
    "q40_set_ops": QuerySpec(q40_set_ops, _Q40_SQL),
    "q44_window_analytics": QuerySpec(q44_window_analytics, _Q44_SQL),
}


# --- q45: exact grouped percentiles (continuous interpolation) -------------
def q45_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (sort-based, linear interpolation —
    verified bit-identical to DuckDB's quantile_cont).  Exact percentile
    is a full sort per group; at 100 TB prefer approx_percentile's
    KLL/GK sketch unless the contract demands exactness."""
    t = bind(spark, sf_dir, "orders")
    return t["orders"].groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


_Q45_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders
GROUP BY o_orderpriority
"""

QUERIES["q45_percentiles"] = QuerySpec(q45_percentiles, _Q45_SQL)


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
