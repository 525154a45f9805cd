"""Cross-engine-deterministic numeric aggregation helpers.

Money lives in ``decimal(18,2)`` in the reference (explicit casts at
``silver/silver_rx_claims_load.py:153-155``).  This module generalizes that:
aggregate monetary/measure expressions in *exact decimal* so the result is
independent of partitioning and accumulation order, then surface a double.

Why: floating-point addition is not associative — a distributed SUM(double)
over N partitions returns last-bit-different results run to run and engine
to engine.  Summing ``decimal`` is exact, so Spark and any ANSI oracle
(DuckDB here) agree bit-for-bit, at any parallelism.  This also matters at
100 TB: decimal aggregation keeps results stable under AQE re-partitioning.

Half-way rounding on the double→decimal cast cannot disagree between
engines: a binary double can never be exactly ``x.xx5`` (denominator is not
a power of two), so round-to-nearest is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
DEC6 = "decimal(28,6)"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal SUM of a double expression, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_sum_sql(expr: str, scale: int = 2) -> str:
    """ANSI-SQL twin of :func:`dec_sum` (same value in DuckDB)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def safe_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact-decimal sum divided by count.

    ``sum/count`` on identical double operands is a single IEEE division —
    deterministic everywhere — unlike AVG(double), whose running mean
    depends on row order.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def safe_avg_sql(expr: str, scale: int = 2) -> str:
    return f"({dec_sum_sql(expr, scale)} / COUNT({expr}))"
