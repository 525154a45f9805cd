"""Incremental aggregate maintenance from the change data feed.

The materialized-view refresh every lakehouse runs: a gold aggregate
table (grouped sums/counts over a huge base table) kept current by
processing only the base's CHANGES since the last refresh — the whole
point of the CDF (`sources/tables.changes_between`).  A full recompute
re-shuffles 100 TB per refresh; the incremental path costs:

- one CDF read over the commits since the watermark (append-shaped
  commits read exactly their added files — cost ∝ change, not table);
- one grouped aggregate over those change rows (``insert`` rows add,
  ``delete`` rows subtract — an UPDATE is its delete+insert pair, so
  the algebra needs no special case);
- one outer merge of the delta against the CURRENT aggregate rows —
  group-cardinality-sized, the small side by construction.

SUM / COUNT (and any linear statistic) are self-inverting under
deletes, which is why this works without re-reading the base; MIN/MAX
are not (a deleted extremum needs a base rescan) and are deliberately
out of scope.

Exactly-once: the refreshed rows and the "refreshed through base
version N" watermark land in ONE commit (``overwrite(extra_props=)``),
so a crash anywhere leaves either the old state (next refresh replays
the same delta once) or the new state (next refresh starts after N) —
never a half-applied delta.  Groups whose row count reaches zero are
dropped, so the aggregate equals a from-scratch recompute exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

_WATERMARK = "incremental_refreshed_through"
_COUNT = "n_rows"


def _aggregate(df: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str], sign=None) -> DataFrame:
    weight = F.lit(1) if sign is None else sign
    aggs = [F.sum(F.col(c) * weight).alias(c) for c in sum_cols]
    aggs.append(F.sum(weight).alias(_COUNT))
    return df.groupBy(*group_cols).agg(*aggs)


def refresh_sum_aggregate(
    base: ParquetTable,
    agg_root: str,
    *,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> int:
    """Create or incrementally refresh the aggregate table at
    ``agg_root`` — ``group_cols`` + per-column sums + ``n_rows`` —
    to match ``base``'s CURRENT version.  Returns the base version the
    aggregate now reflects.  Idempotent: refreshing with no new base
    commits is a no-op (no commit written)."""
    spark = base.spark
    base_version = base.latest_version()

    if not is_table(agg_root):
        full = _aggregate(base.read(), group_cols, sum_cols)
        ParquetTable.create(spark, agg_root, full)
        tbl = ParquetTable.for_path(spark, agg_root)
        # CREATE + watermark are two commits, but the missing-watermark
        # state is unambiguous (treated as never-refreshed below) only
        # if we guard on it — so stamp it via a zero-delta overwrite
        tbl.overwrite(full, extra_props={_WATERMARK: base_version})
        return base_version

    tbl = ParquetTable.for_path(spark, agg_root)
    m = tbl._manifest()
    last = m.get("props", {}).get(_WATERMARK)
    if last is None:
        # the half-created state (crash between CREATE and the stamped
        # overwrite) — or a foreign table handed to us; either way the
        # safe recovery is a full rebuild stamped atomically
        full = _aggregate(base.read(), group_cols, sum_cols)
        tbl.overwrite(full, extra_props={_WATERMARK: base_version})
        return base_version
    last = int(last)
    if last >= base_version:
        return last  # nothing new — no commit

    changes = base.changes_between(last, base_version)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = _aggregate(changes, group_cols, sum_cols, sign=sign)

    cur = tbl.read()
    d = delta.select(
        *group_cols,
        *[F.col(c).alias(f"_d_{c}") for c in sum_cols],
        F.col(_COUNT).alias(f"_d_{_COUNT}"),
    )
    merged = (
        cur.join(d, list(group_cols), "full_outer")
        .select(
            *group_cols,
            *[
                (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_d_{c}"), F.lit(0))).alias(c)
                for c in sum_cols
            ],
            (
                F.coalesce(F.col(_COUNT), F.lit(0))
                + F.coalesce(F.col(f"_d_{_COUNT}"), F.lit(0))
            ).alias(_COUNT),
        )
        .filter(F.col(_COUNT) > 0)
    )
    tbl.overwrite(merged, extra_props={_WATERMARK: base_version})
    return base_version
