"""Dimension builders: distributed date dimension + surrogate keys.

Reference parity: dim_date generated 2020-01-01..2030-12-31 with calendar
attributes (``gold/gold_rx_claims_load.py:36-72``).  The reference builds
the row list in a driver-side Python loop; this engine generates it
distributed via ``sequence() + explode`` (S5, SURVEY.md §1.1) so a
century-long dimension never bottlenecks the driver.

``date_key`` implements the documented intent of the reference's buggy
``col.cast("string").replace("-","")`` (``gold/gold_rx_claims_load.py:51``,
SURVEY.md §0.2): a yyyymmdd integer.

The 12-way month-name ``when`` chain (``gold/gold_rx_claims_load.py:59-72``)
is kept as a Catalyst expression for parity (F6) — a date_format('MMMM')
one-liner would also do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_MONTHS = (
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
)


def month_name_expr(month_col: Column) -> Column:
    """12-way conditional month-name mapping (F6 parity)."""
    expr = F.when(month_col == 1, _MONTHS[0])
    for i in range(1, 12):
        expr = expr.when(month_col == i + 1, _MONTHS[i])
    return expr


def date_key_expr(date_col: Column) -> Column:
    """yyyymmdd integer surrogate for a date (F2 intent)."""
    return F.regexp_replace(date_col.cast("string"), "-", "").cast("int")


def build_date_dim(
    spark: SparkSession, start: str = "2020-01-01", end: str = "2030-12-31"
) -> DataFrame:
    """Distributed calendar dimension with derived attributes
    (``gold/gold_rx_claims_load.py:50-72``)."""
    dates = spark.sql(
        f"SELECT explode(sequence(DATE'{start}', DATE'{end}')) AS date_value"
    )
    m = F.month("date_value")
    return dates.select(
        date_key_expr(F.col("date_value")).alias("date_key"),
        F.col("date_value"),
        F.year("date_value").alias("year"),
        m.alias("month"),
        F.dayofmonth("date_value").alias("day"),
        F.quarter("date_value").alias("quarter"),
        F.dayofweek("date_value").alias("day_of_week"),
        F.weekofyear("date_value").alias("week_of_year"),
        F.dayofweek("date_value").isin(1, 7).alias("is_weekend"),
        month_name_expr(m).alias("month_name"),
    )


def add_surrogate_key(df: DataFrame, name: str, business_key: str | None = None) -> DataFrame:
    """Surrogate key column.

    The reference uses ``monotonically_increasing_id``
    (``gold/gold_rx_claims_load.py:108,142,207``) — non-deterministic across
    runs.  When ``business_key`` is given we instead assign a dense 1..N
    key in ``business_key`` order: stable, testable, and reproducible
    (SURVEY.md §7.3).  The mii variant is kept for parity when no key
    exists.

    Scale: a plain ``Window.orderBy(key)`` with no partition would funnel
    the whole table through one task.  Instead we range-partition on the
    key, rank *within* each partition (parallel local sorts), and add a
    per-partition offset computed from a tiny partition-count frame — the
    classic zipWithIndex shape, expressed declaratively.  Duplicate
    business keys get arbitrary-but-dense numbering; pass a unique key.
    """
    if business_key is None:
        return df.withColumn(name, F.monotonically_increasing_id())
    ranged = df.repartitionByRange(business_key).withColumn(
        "_sk_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_sk_pid").orderBy(business_key)
    ranked = ranged.withColumn("_sk_rn", F.row_number().over(local_w))
    # partition-count frame: #rows == #partitions, so the unpartitioned
    # running-sum window below is over a frame of trivial size.
    offsets = (
        ranked.groupBy("_sk_pid")
        .agg(F.count(F.lit(1)).alias("_sk_cnt"))
        .withColumn(
            "_sk_offset",
            F.coalesce(
                F.sum("_sk_cnt").over(
                    Window.orderBy("_sk_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_sk_pid", "_sk_offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "_sk_pid")
        .withColumn(name, (F.col("_sk_offset") + F.col("_sk_rn")).cast("long"))
        .drop("_sk_pid", "_sk_rn", "_sk_offset")
    )
