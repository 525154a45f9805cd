"""Cost-based decisions fed by ``ANALYZE TABLE`` statistics.

Databricks' engine consumes table statistics in two load-bearing ways
(the reference's ``README.md:64`` "optimize queries" line): metadata-only
``count(*)`` answers and cost-based join-side selection.  This engine's
tables live outside Spark's catalog (their stats are the versioned
``statistics`` table property written by :meth:`ParquetTable.analyze`),
so Spark's own CBO never sees them — this module is the consumer that
turns them into plan decisions.

Staleness discipline: a statistic may only drive a decision when it
describes the CURRENT snapshot (``as_of_version == latest``).  Stale or
absent stats fall back to the caller's declared default — for the
engine's composed joins that default is today's behavior (broadcast
small-by-construction dims, let AQE size everything else), so turning
stats on can only refine decisions, never break a query that worked
without them.

Why a static hint at all when AQE re-plans at runtime?  AQE decides
after the first shuffle map stage has already run; a statically planned
broadcast join skips that shuffle entirely.  At 100 TB the difference is
materializing a shuffle of the large side's join keys vs never
shuffling it — stats let us make the cheap decision before execution,
and *decline* it when the "small" side is provably not small (AQE can
still promote at runtime; a declined hint loses nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Spark's own spark.sql.autoBroadcastJoinThreshold default (10 MiB).
# Our sizes are parquet-compressed bytes / stats estimates, both of
# which UNDER-state in-memory row size, so the conservative default
# threshold matters: callers at larger executor memory can raise it.
DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024

# Estimated in-memory bytes per value for fixed-width types and the
# overhead added to a string's measured avg_len (UnsafeRow offset+len
# accounting) — same order Spark's SizeEstimator uses.
_FIXED_WIDTH = 8
_STRING_OVERHEAD = 16


def fresh_statistics(table) -> dict | None:
    """The table's ANALYZE statistics iff they still describe the
    CURRENT snapshot; ``None`` when absent or stale.  Decisions must
    never read a stale stat — a dim that doubled since its last ANALYZE
    would otherwise still look broadcastable.  Delegates to the table
    layer's staleness rule (data-changing commits invalidate,
    metadata-only commits don't — the same rule DESCRIBE EXTENDED
    flags)."""
    return table.fresh_statistics()


def estimated_size(
    stats: dict | None, columns: list[str] | None = None
) -> int | None:
    """Estimated in-memory bytes of a (projection of a) table snapshot,
    or ``None`` when the stats can't bound it.

    With ``columns`` and per-column stats for every named column
    (``ANALYZE ... FOR COLUMNS``), the estimate is
    ``num_rows x sum(column widths)`` — string widths from the measured
    ``avg_len``.  Otherwise the whole-table parquet ``size_bytes`` is
    the (upper-bound) fallback: correct for full-row frames, pessimistic
    for narrow projections — pessimism here only declines a hint AQE
    can still restore at runtime."""
    if not stats:
        return None
    if columns:
        rows = stats.get("num_rows")
        col_stats = stats.get("columns") or {}
        if rows is not None and all(c in col_stats for c in columns):
            width = 0.0
            for c in columns:
                cs = col_stats[c]
                if "avg_len" in cs:
                    width += (cs["avg_len"] or 0.0) + _STRING_OVERHEAD
                else:
                    width += _FIXED_WIDTH
            return int(rows * width)
    return stats.get("size_bytes")


def maybe_broadcast(
    df: DataFrame,
    stats: dict | None = None,
    *,
    columns: list[str] | None = None,
    default: bool = True,
    threshold: int = DEFAULT_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Stats-driven broadcast hint.

    Fresh stats bounding the frame under ``threshold`` -> hint
    ``F.broadcast``; fresh stats saying it's LARGER -> return ``df``
    unhinted (decline — the runtime may still broadcast via AQE if the
    post-filter size shrinks, but we won't force a 100 TB dim onto every
    executor on the strength of a hint); no usable estimate -> the
    caller's ``default`` (today's behavior).  Returns ``df`` itself
    (identity) whenever no hint is applied, so tests can assert the
    decision without plan archaeology."""
    est = estimated_size(stats, columns)
    if est is None:
        return F.broadcast(df) if default else df
    return F.broadcast(df) if est <= threshold else df
