"""Column profiling: the Databricks data-profile / ``dbutils.data.
summarize`` surface as a two-pass DataFrame operator.

A profile answers "what is in this table" before any pipeline decision:
null rates, cardinalities, numeric ranges/quantiles, string lengths,
dominant values.  The Databricks UI computes this per displayed table;
here it is an operator so a 100 TB pipeline can gate on it (e.g. refuse
a training shard whose null rate jumped).

Scale design:

- Pass 1 (``profile``): ONE aggregate over the frame computes every
  scalar stat for every profiled column simultaneously — count,
  null count, approx distinct (HLL), min/max, and for numerics
  mean/stddev/approx quantiles.  No shuffle beyond the aggregate's own
  partial/final pair; cost is one scan regardless of column count.
- Pass 2 (``top_values``, optional): all requested columns are stacked
  into one long ``(column, value)`` frame in a single projection, then
  ONE hash aggregate + per-column rank window yields the top-k values
  per column — one shuffle for ALL columns together, never a
  per-column job loop.

Output is long-format (``column, metric, value``) with values rendered
as strings — a profile is a report, not an input to arithmetic; exact
numerics stay exact (counts render as integers), doubles use shortest
round-trip repr via Spark's CAST.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    relative_error: float = 0.01,
) -> DataFrame:
    """Long-format ``(column, metric, value)`` profile of ``df`` in ONE
    aggregate pass.

    Metrics per column: ``count`` (non-null), ``nulls``,
    ``approx_distinct``; plus ``min``/``max``/``mean``/``stddev`` and
    ``q<p>`` approx quantiles for numeric columns, ``min_len``/
    ``max_len``/``avg_len`` for strings.  Complex-typed columns (array/
    map/struct) report only ``count``/``nulls`` — their elements are
    pipeline-specific.  ``value`` is a string rendering (see module
    docstring)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs: list = []
    plan: list[tuple[str, str, str]] = []  # (column, metric, agg alias)

    def _add(col: str, metric: str, expr) -> None:
        alias = f"__p_{len(plan)}"
        aggs.append(expr.alias(alias))
        plan.append((col, metric, alias))

    total = F.count(F.lit(1))
    _add("", "__rows", total)  # one shared row count
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        _add(c, "count", F.count(col))
        _add(c, "approx_distinct", F.approx_count_distinct(col))
        if isinstance(dt, _NUMERIC):
            _add(c, "min", F.min(col).cast("string"))
            _add(c, "max", F.max(col).cast("string"))
            _add(c, "mean", F.avg(col).cast("string"))
            _add(c, "stddev", F.stddev(col).cast("string"))
            for q in quantiles:
                _add(
                    c,
                    f"q{q:g}",
                    F.percentile_approx(
                        col, float(q), int(1.0 / relative_error)
                    ).cast("string"),
                )
        elif isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
            ln = F.length(col)
            _add(c, "min_len", F.min(ln).cast("string"))
            _add(c, "max_len", F.max(ln).cast("string"))
            _add(c, "avg_len", F.avg(ln).cast("string"))
        elif isinstance(
            dt, (T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType)
        ):
            _add(c, "min", F.min(col).cast("string"))
            _add(c, "max", F.max(col).cast("string"))

    row = df.agg(*aggs)

    # unpivot the single aggregate row into (column, metric, value); the
    # per-column null count derives from the shared total row count so
    # the whole profile stays one pass
    items = []
    rows_alias = plan[0][2]
    for col, metric, alias in plan[1:]:
        items.append((col, metric, F.col(alias).cast("string")))
        if metric == "count":
            items.append(
                (
                    col,
                    "nulls",
                    (F.col(rows_alias) - F.col(alias)).cast("string"),
                )
            )
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(m).alias("metric"),
                v.alias("value"),
            )
            for c, m, v in items
        ]
    )
    return (
        row.select(F.explode(stacked).alias("p"))
        .select("p.column", "p.metric", "p.value")
    )


def top_values(
    df: DataFrame, columns: Sequence[str] | None = None, k: int = 3
) -> DataFrame:
    """Top-``k`` most frequent values per column as ``(column, value,
    n, rank)`` — ONE stacked aggregate for all columns (never a
    per-column job loop).  NULLs are excluded (they are the profile's
    ``nulls`` metric, not a value).  Ties break by value string for a
    deterministic report."""
    fields = [f.name for f in df.schema.fields]
    cols = list(columns) if columns is not None else fields
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if k < 1:
        raise ValueError("k must be >= 1")

    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column", "s.value")
    counted = (
        stacked.filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
