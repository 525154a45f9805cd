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
    runs.  When ``business_key`` is given we instead use a dense
    ``row_number`` over it: stable, testable, and reproducible (SURVEY.md
    §7.3).  The mii variant is kept for parity when no key exists.

    Note the single-partition window is fine for dimension-sized inputs;
    for billion-row facts prefer ``monotonically_increasing_id`` (no
    shuffle) or ``zipWithIndex``-style keys.
    """
    if business_key is None:
        return df.withColumn(name, F.monotonically_increasing_id())
    w = Window.orderBy(business_key)
    return df.withColumn(name, F.row_number().over(w).cast("long"))
