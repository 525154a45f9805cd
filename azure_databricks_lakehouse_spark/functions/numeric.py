"""Cross-engine-deterministic numeric aggregation helpers.

Money lives in ``decimal(18,2)`` in the reference (explicit casts at
``silver/silver_rx_claims_load.py:153-155``).  This module generalizes
that: aggregate monetary/measure expressions in *exact decimal* so the
result is independent of partitioning and accumulation order, then surface
a double.

Why: floating-point addition is not associative — a distributed
SUM(double) over N partitions returns last-bit-different results run to
run and engine to engine.  Summing ``decimal`` is exact, so Spark and any
ANSI oracle (DuckDB here) agree bit-for-bit, at any parallelism.  This
also matters at 100 TB: decimal aggregation keeps results stable under AQE
re-partitioning.

**Cast raw columns, never derived doubles.**  Engines disagree on
double→decimal rounding of *derived* products: Spark casts through the
double's shortest decimal string (HALF_UP on that string), DuckDB rounds
the exact binary value — ``price * (1 - disc)`` can land on opposite sides
of the half-way point.  Raw corpus columns carry ≤2 true decimal digits,
where shortest-string and exact-value rounding coincide, so the cast is
engine-agnostic there and only there.  Multiply *after* casting:
``dec(price) * (1 - dec(disc))`` is exact decimal arithmetic with an
identical result in both engines.  Helpers here size precisions so chained
products stay under DECIMAL(38) with no scale truncation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
DEC6 = "decimal(28,6)"
# Tight types for measure arithmetic: money (15,2) and small rates (6,2)
# keep a money*rate*rate chain at decimal(29,6) — exact, no 38-digit cap.
MONEY = "decimal(15,2)"
RATE = "decimal(6,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    """Cast a *raw* double column to exact decimal (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dec_sql(expr: str, typ: str = MONEY) -> str:
    """ANSI-SQL twin of :func:`dec`."""
    return f"CAST({expr} AS {typ.upper()})"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal SUM of a raw double column, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_sum_sql(expr: str, scale: int = 2) -> str:
    """ANSI-SQL twin of :func:`dec_sum` (same value in DuckDB)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sum_double(col: Column) -> Column:
    """SUM of an already-decimal expression, surfaced as double."""
    return F.sum(col).cast("double")


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
