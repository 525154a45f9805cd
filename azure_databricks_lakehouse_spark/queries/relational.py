"""Batch-relational operator corpus (SURVEY.md §2.1-2.7) with DuckDB oracles.

Every query exercises specific reference operators (cited per function) on
the driver's TPC-H-ish tables.  Aggregates use exact-decimal summation
(``functions/numeric.py``): raw double columns are cast to decimal *before*
any arithmetic, so Spark and the DuckDB oracle agree bit-for-bit regardless
of partitioning/accumulation order (casting derived doubles is the trap —
see the numeric module doc).

Binding is lazy: each query loads only the tables it touches
(``sources/catalog.bind``), so no unrelated table can fail a query and no
unnecessary metadata work happens at a large catalog.

Column names are aliased identically in the DataFrame code and the oracle
SQL — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.numeric import (
    RATE,
    dec,
    dec_sum,
    dec_sum_sql,
    sum_double,
)
from azure_databricks_lakehouse_spark.operators.dedup import keep_latest
from azure_databricks_lakehouse_spark.operators.dims import (
    build_date_dim,
    date_key_expr,
    month_name_expr,
)
from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind

# Shared exact-decimal measure fragments (see numeric.py module doc):
# cast the raw columns, then multiply — both engines do exact decimal
# arithmetic on identical operands.
_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (1 - CAST(l_discount AS DECIMAL(6,2)))"
)
_CHARGE_SQL = f"{_DISC_PRICE_SQL} * (1 + CAST(l_tax AS DECIMAL(6,2)))"


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast(RATE) - dec("l_discount", RATE))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1).cast(RATE) + dec("l_tax", RATE))


# --- q01: flagship — grouped aggregates over the fact (A5/A3, agg tables
#     reconstructed from gold/gold_rx_claims_load.py:237-245 + :10 imports) ---
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            sum_double(_disc_price()).alias("sum_disc_price"),
            sum_double(_charge()).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dec_sum_sql('l_quantity')} AS sum_qty,
       {dec_sum_sql('l_extendedprice')} AS sum_base_price,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_CHARGE_SQL}) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       {dec_sum_sql('l_quantity')} / COUNT(*) AS avg_qty,
       {dec_sum_sql('l_extendedprice')} / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q02: predicate pushdown surface — P4/P5/P8/P9 filters -----------------
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "part")
    return (
        t["part"]
        .filter(
            F.col("p_size").isin(5, 10, 15, 20, 25)
            & F.col("p_name").rlike("^(small|large) ")
            & (F.col("p_retailprice") > 500.0)
            & F.col("p_brand").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    )


_Q02_SQL = """
SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
FROM part
WHERE p_size IN (5, 10, 15, 20, 25)
  AND regexp_matches(p_name, '^(small|large) ')
  AND p_retailprice > 500.0
  AND p_brand IS NOT NULL
"""


# --- q03: star-schema multi-way join (J1-J4 shape, broadcast dims J5) ------
def q03_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            sum_double(_disc_price()).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


_Q03_SQL = f"""
SELECT r_name, n_name,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- q04: generated date dimension + role-playing date joins (S5/J3/J4/F2) -
def q04_date_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "lineitem", "orders")
    dim = build_date_dim(spark, "1995-01-01", "2002-12-31").select("date_key", "date_value")
    ship_dim = dim.select(
        F.col("date_key").alias("ship_date_key"), F.col("date_value").alias("ship_dv")
    )
    order_dim = dim.select(
        F.col("date_key").alias("order_date_key"), F.col("date_value").alias("order_dv")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(ship_dim), F.to_date("l_shipdate") == F.col("ship_dv"), "left")
        .join(F.broadcast(order_dim), F.to_date("o_orderdate") == F.col("order_dv"), "left")
        .groupBy("ship_date_key", "order_date_key")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice").alias("sum_price"),
        )
    )


_Q04_SQL = f"""
WITH dim AS (
  SELECT CAST(strftime(CAST(d AS DATE), '%Y%m%d') AS INT) AS date_key,
         CAST(d AS DATE) AS date_value
  FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '2002-12-31',
                                      INTERVAL 1 DAY)) AS d)
)
SELECT ds.date_key AS ship_date_key, dd.date_key AS order_date_key,
       COUNT(*) AS n_items,
       {dec_sum_sql('l_extendedprice')} AS sum_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
LEFT JOIN dim ds ON CAST(l_shipdate AS DATE) = ds.date_value
LEFT JOIN dim dd ON CAST(o_orderdate AS DATE) = dd.date_value
GROUP BY 1, 2
"""


# --- q05: keep-latest dedup via ranking window (W1/A6) ---------------------
def q05_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "events")
    deduped = keep_latest(
        t["events"],
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return deduped.select("event_id", "user_id", "event_type")


_Q05_SQL = """
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- q06: watermark-style incremental filter (ST1/A1/A2) -------------------
def q06_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "events")
    ev = t["events"]
    # scalar high-water mark to the driver, re-injected as a literal —
    # exactly the reference's watermark pattern
    # (silver/silver_rx_claims_load.py:29-43, bronze:110-112)
    wm = ev.agg(F.max(F.date_trunc("day", F.col("ts"))).alias("wm")).first()["wm"]
    cutoff = wm - _dt.timedelta(days=7)
    return (
        ev.filter(F.col("ts") >= F.lit(cutoff))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


_Q06_SQL = f"""
SELECT event_type, COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS sum_value
FROM events
WHERE ts >= (SELECT max(date_trunc('day', ts)) - INTERVAL 7 DAY FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# --- q07: chained conditionals + coalesce + month-name (P6/P7/F6) ----------
def q07_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("price_bucket"),
        month_name_expr(F.month("o_orderdate")).alias("order_month_name"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


_Q07_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       CASE month(o_orderdate)
            WHEN 1 THEN 'January' WHEN 2 THEN 'February' WHEN 3 THEN 'March'
            WHEN 4 THEN 'April' WHEN 5 THEN 'May' WHEN 6 THEN 'June'
            WHEN 7 THEN 'July' WHEN 8 THEN 'August' WHEN 9 THEN 'September'
            WHEN 10 THEN 'October' WHEN 11 THEN 'November' WHEN 12 THEN 'December'
       END AS order_month_name,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm
FROM orders
"""


# --- q08: string standardization (F1-shape: trim/upper + friends) ----------
def q08_string_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "customer")
    return t["customer"].select(
        "c_custkey",
        F.upper(F.trim(F.col("c_name"))).alias("name_std"),
        F.expr("right(c_name, 9)").alias("name_num"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "segment_tag"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
    )


_Q08_SQL = """
SELECT c_custkey,
       upper(trim(c_name)) AS name_std,
       right(c_name, 9) AS name_num,
       length(c_name) AS name_len,
       concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS segment_tag,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded
FROM customer
"""


# --- q09: date-part extraction + yyyymmdd date key (F2/F5) -----------------
def q09_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return t["orders"].select(
        "o_orderkey",
        date_key_expr(d).alias("order_date_key"),
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.quarter(d).alias("o_quarter"),
        F.dayofweek(d).alias("o_dow"),
        F.weekofyear(d).alias("o_week"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
    )


_Q09_SQL = """
SELECT o_orderkey,
       CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INT) AS order_date_key,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       dayofweek(o_orderdate) + 1 AS o_dow,
       weekofyear(o_orderdate) AS o_week,
       dayofweek(o_orderdate) IN (0, 6) AS is_weekend
FROM orders
"""


# --- q10: distinct / count-distinct (A4) -----------------------------------
def q10_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One declarative plan: the 1-row segment count cross-joins the 1-row
    # order aggregate (Catalyst: BroadcastNestedLoopJoin of two singleton
    # aggregates).  No driver-side action inside the builder — at 100 TB a
    # collect here would serialize the query build on a full table scan.
    t = bind(spark, sf_dir, "orders", "customer")
    order_counts = t["orders"].agg(
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.countDistinct(F.to_date("o_orderdate")).alias("n_order_dates"),
    )
    seg_count = t["customer"].agg(F.countDistinct("c_mktsegment").alias("n_segments"))
    return order_counts.crossJoin(seg_count)


_Q10_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS n_customers_with_orders,
       COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_order_dates,
       (SELECT COUNT(DISTINCT c_mktsegment) FROM customer) AS n_segments
FROM orders
"""


# --- q11: ranking surface — per-group window, QUALIFY route, global top-k --
# QUALIFY text shared verbatim by the engine front-end and the DuckDB
# oracle: Spark has no QUALIFY, so sources/sql.py rewrites it into a
# window projection + filter; DuckDB runs it natively — the rewrite
# (including select-alias visibility in the post-filter) is verified
# against a first-class implementation, the q34/ASOF pattern.
_Q11_QUALIFY = """
SELECT o_orderstatus AS grp, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       ROW_NUMBER() OVER (
         PARTITION BY o_orderstatus
         ORDER BY o_totalprice DESC, o_orderkey
       ) AS rnk
FROM orders
QUALIFY rnk <= 5
"""

# QUALIFY under a SELECT DISTINCT head (round 11): the filter runs on
# the PRE-dedup rows (standard order QUALIFY→DISTINCT) — survivors are
# the (status, custkey-bucket) pairs whose first-by-orderkey row has a
# key divisible by 3.  The oracle twin spells the evaluation order out
# explicitly (window+filter inside, DISTINCT outside), so the rewrite
# answers to the ORDER, not to DuckDB's own QUALIFY implementation.
_Q11_QUALIFY_DISTINCT = """
SELECT DISTINCT o_orderstatus AS grp, CAST(o_custkey % 100 AS INT) AS ck
FROM orders
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY o_orderstatus, o_custkey % 100
    ORDER BY o_orderkey) = 1
  AND o_orderkey % 3 = 0
"""


def q11_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ranking shapes in one tagged union (round-10 corpus
    consolidation under the driver's 50-query budget — the former
    q12_global_topk merges in, freeing its slot):

    - ``part='window'``: top-3 orders per market segment via a ranking
      window (W1 generalization), the original q11.
    - ``part='qualify'``: top-5 orders per status via the Databricks
      ``QUALIFY`` clause routed through the engine SQL front-end
      (round-10 surface) — the window lives in the post-filter and the
      predicate references a select-list alias, both QUALIFY-specific
      behaviors Spark SQL cannot parse.
    - ``part='global'``: global top-100 by ``orderBy().limit()`` (§2.7)
      — the plan must stay ``TakeOrderedAndProject`` (per-partition
      heap + single merge, never a global sort; pinned in
      tests/test_plan_shapes.py).
    """
    from azure_databricks_lakehouse_spark.sources.sql import Lakehouse

    t = bind(spark, sf_dir, "orders", "customer")
    joined = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    window_part = (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.lit("window").alias("part"),
            F.col("c_mktsegment").alias("grp"),
            F.col("rnk"),
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
        )
    )
    lh = Lakehouse(spark)
    qualify_part = lh.sql(_Q11_QUALIFY).select(
        F.lit("qualify").alias("part"), "grp", "rnk", "o_orderkey", "price"
    )
    qualify_distinct_part = lh.sql(_Q11_QUALIFY_DISTINCT).select(
        F.lit("qualify_distinct").alias("part"),
        "grp",
        F.col("ck").alias("rnk"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("price"),
    )
    global_part = (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            F.lit("global").alias("part"),
            F.col("o_custkey").cast("string").alias("grp"),
            F.lit(None).cast("int").alias("rnk"),
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
        )
    )
    return (
        window_part.unionByName(qualify_part)
        .unionByName(qualify_distinct_part)
        .unionByName(global_part)
    )


_Q11_SQL = f"""
SELECT 'window' AS part, grp, rnk, o_orderkey, price
FROM (
  SELECT c_mktsegment AS grp, o_orderkey, o_totalprice AS price,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rnk <= 3
UNION ALL
SELECT 'qualify', grp, rnk, o_orderkey, price FROM ({_Q11_QUALIFY})
UNION ALL
SELECT DISTINCT 'qualify_distinct', grp, ck,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM (
  SELECT o_orderstatus AS grp, CAST(o_custkey % 100 AS INTEGER) AS ck,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus, o_custkey % 100
                            ORDER BY o_orderkey) AS rn,
         o_orderkey
  FROM orders
) WHERE rn = 1 AND o_orderkey % 3 = 0
UNION ALL
SELECT 'global', CAST(o_custkey AS VARCHAR), CAST(NULL AS INTEGER),
       o_orderkey, price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice AS price
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 100
)
"""


# --- q13: semi/anti joins + set operators (merged q13 + q40) ----------------
def q13_semi_anti_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (§2.4 extension surface) plus INTERSECT/EXCEPT set
    algebra — merged from the former q13_semi_anti_join and q40_set_ops
    so the corpus fits the driver's 50-query correctness budget
    (round-3 verdict item 1).  One tagged union of four cohorts:

    - ``has_orders`` / ``no_orders``: customer existence via
      ``left_semi`` / ``left_anti`` (EXISTS / NOT EXISTS twins);
    - ``both_95_96`` / ``only_1995``: retention cohorts via
      ``intersect`` / ``subtract`` (SQL INTERSECT / EXCEPT — each plans
      as an aggregate + join, not a full materialized distinct per side).
    """
    t = bind(spark, sf_dir, "customer", "orders")
    cust, orders = t["customer"], t["orders"]
    cond = F.col("c_custkey") == F.col("o_custkey")
    with_orders = (
        cust.join(orders, cond, "left_semi")
        .select(F.col("c_custkey").alias("custkey"))
        .withColumn("cohort", F.lit("has_orders"))
    )
    without_orders = (
        cust.join(orders, cond, "left_anti")
        .select(F.col("c_custkey").alias("custkey"))
        .withColumn("cohort", F.lit("no_orders"))
    )
    o = orders.select("o_custkey", F.year(F.to_date("o_orderdate")).alias("y"))
    y95 = o.filter(F.col("y") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.col("y") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select(
        F.col("o_custkey").alias("custkey"), F.lit("both_95_96").alias("cohort")
    )
    churned = y95.subtract(y96).select(
        F.col("o_custkey").alias("custkey"), F.lit("only_1995").alias("cohort")
    )
    return (
        with_orders.unionByName(without_orders)
        .unionByName(both)
        .unionByName(churned)
    )


_Q13_SQL = """
SELECT c_custkey AS custkey, 'has_orders' AS cohort FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT c_custkey AS custkey, 'no_orders' AS cohort FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT custkey, cohort FROM (
  WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
       y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
  SELECT o_custkey AS custkey, 'both_95_96' AS cohort
  FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
  UNION ALL
  SELECT o_custkey AS custkey, 'only_1995' AS cohort
  FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
)
"""


# --- q14: rollup aggregation (§2.5 extension: df.rollup) --------------------
def q14_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


_Q14_SQL = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       {dec_sum_sql('c_acctbal')} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name, n_name
"""


# --- q15: pivot (§2.5 extension: df.pivot) -----------------------------------
def q15_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dec_sum("l_quantity"))
        .orderBy("l_returnflag")
    )


_Q15_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F"
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, _Q01_SQL),
    "q02_filter_predicates": QuerySpec(q02_filter_predicates, _Q02_SQL),
    "q03_star_join_revenue": QuerySpec(q03_star_join_revenue, _Q03_SQL),
    "q04_date_dim_join": QuerySpec(q04_date_dim_join, _Q04_SQL),
    "q05_dedup_latest": QuerySpec(q05_dedup_latest, _Q05_SQL),
    "q06_watermark_filter": QuerySpec(q06_watermark_filter, _Q06_SQL),
    "q07_case_buckets": QuerySpec(q07_case_buckets, _Q07_SQL),
    "q08_string_standardize": QuerySpec(q08_string_standardize, _Q08_SQL),
    "q09_date_parts": QuerySpec(q09_date_parts, _Q09_SQL),
    "q10_distinct_counts": QuerySpec(q10_distinct_counts, _Q10_SQL),
    "q11_topk_per_group": QuerySpec(q11_topk_per_group, _Q11_SQL),
    "q13_semi_anti_set_ops": QuerySpec(q13_semi_anti_set_ops, _Q13_SQL),
    "q14_rollup_customers": QuerySpec(q14_rollup_customers, _Q14_SQL),
    "q15_pivot_status": QuerySpec(q15_pivot_status, _Q15_SQL),
}
