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
deletes, which is why they need no base access.  MIN / MAX are not:
an insert can only tighten an extremum (``least``/``greatest`` against
the current value), but a DELETE that removes the row *carrying* the
extremum invalidates it.  ``min_cols``/``max_cols`` therefore keep a
retraction fallback: the merge detects groups whose deleted values
reach the candidate extremum and recomputes ONLY those groups from the
(version-pinned) base — cost ∝ affected groups, never the table.

Exactly-once: the refreshed rows and the "refreshed through base
version N" watermark land in ONE commit (``overwrite(extra_props=)``),
so a crash anywhere leaves either the old state (next refresh replays
the same delta once) or the new state (next refresh starts after N) —
never a half-applied delta.  Groups whose row count reaches zero are
dropped, and NULL group keys are merged null-safely (``eqNullSafe`` —
a plain equi-join would split the NULL group on every refresh), so the
aggregate equals a from-scratch recompute exactly.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

_WATERMARK = "incremental_refreshed_through"
_LAST_RESCAN = "incremental_last_rescan_groups"
_COUNT = "n_rows"

# CDF change types that add a row to the group (the postimage side);
# everything else ("delete", "update_preimage") retracts one.
_INSERT_TYPES = ("insert", "update_postimage")


_HLL_LGK = 12


def _aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
    sign=None,
) -> DataFrame:
    weight = F.lit(1) if sign is None else sign
    aggs = [F.sum(F.col(c) * weight).alias(c) for c in sum_cols]
    # per-sum non-NULL count: SQL SUM over a group with no non-NULL
    # values is NULL, and the incremental merge can only reconstruct
    # that from a counter (a stored NULL and "no change" are otherwise
    # indistinguishable from 0 after coalescing)
    aggs += [F.count(F.col(c)).cast("long").alias(f"_nn_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    # per-group HLL sketch: the mergeable state that lets the NEXT
    # refresh fold inserted values in without touching the base
    aggs += [
        F.hll_sketch_agg(F.col(c), F.lit(_HLL_LGK)).alias(f"_sk_{c}")
        for c in distinct_cols
    ]
    aggs.append(F.sum(weight).alias(_COUNT))
    out = df.groupBy(*group_cols).agg(*aggs)
    if distinct_cols:
        out = out.withColumns(
            {
                f"nd_{c}": F.hll_sketch_estimate(F.col(f"_sk_{c}"))
                for c in distinct_cols
            }
        )
    return out


def _null_safe_on(left: DataFrame, right: DataFrame, cols: Sequence[str]):
    """Null-safe equi-join condition: groupBy treats NULL as one group,
    so the merge join must too (plain ``=`` never matches NULL keys and
    would fork the NULL group into new rows every refresh)."""
    return reduce(
        lambda a, b: a & b, [left[c].eqNullSafe(right[c]) for c in cols]
    )


def _extrema_rescan_cond(
    cur: DataFrame,
    delta: DataFrame,
    min_cols: Sequence[str],
    max_cols: Sequence[str],
):
    """Condition marking groups whose MIN/MAX cannot be maintained
    algebraically from the delta — a deleted value REACHES the candidate
    extremum (the deleted row MAY have carried it; duplicates make "did
    it" undecidable without per-value counts, so reaching it is the
    sound trigger).  The refresh recomputes exactly these groups from
    the base; the count lands in the commit props (``_LAST_RESCAN``) as
    auditable evidence the fallback stayed narrow."""
    d = delta
    cond = F.lit(False)
    for c in min_cols:
        cand = F.least(cur[f"min_{c}"], d[f"_d_ins_min_{c}"])
        cond = cond | (
            d[f"_d_del_min_{c}"].isNotNull()
            & (cand.isNull() | (d[f"_d_del_min_{c}"] <= cand))
        )
    for c in max_cols:
        cand = F.greatest(cur[f"max_{c}"], d[f"_d_ins_max_{c}"])
        cond = cond | (
            d[f"_d_del_max_{c}"].isNotNull()
            & (cand.isNull() | (d[f"_d_del_max_{c}"] >= cand))
        )
    return cond


def refresh_sum_aggregate(
    base: ParquetTable,
    agg_root: str,
    *,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> int:
    """Create or incrementally refresh the aggregate table at
    ``agg_root`` — ``group_cols`` + per-column sums (+ optional
    ``min_<c>``/``max_<c>`` extrema, + optional ``nd_<c>`` approximate
    distinct counts) + ``n_rows`` — to match ``base``'s CURRENT
    version.  Returns the base version the aggregate now reflects.
    Idempotent: refreshing with no new base commits is a no-op (no
    commit written).

    ``distinct_cols`` maintain ``COUNT(DISTINCT c)`` through mergeable
    HLL sketches (``operators/sketches``' algebra): each group stores
    its sketch blob (``_sk_<c>``, ~KBs at any cardinality) beside the
    estimate, and an append-only refresh folds the INSERTED values'
    sketch into it with ``hll_union`` — no base access, exact
    sketch-merge path.  Sketches cannot retract, so a group touched by
    any delete/update falls back to the same targeted-group rescan the
    extrema use: only the touched groups are recomputed from the
    pinned base, never the table."""
    spark = base.spark
    base_version = base.latest_version()

    def _full(tbl_read: DataFrame) -> DataFrame:
        return _aggregate(
            tbl_read, group_cols, sum_cols, min_cols, max_cols, distinct_cols
        )

    if not is_table(agg_root):
        # pin the snapshot to the stamped version: reading latest-at-
        # call-time would include a base commit racing in between, which
        # the next refresh then replays via the CDF and double-counts
        full = _full(base.read(version=base_version))
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
        full = _full(base.read(version=base_version))
        tbl.overwrite(full, extra_props={_WATERMARK: base_version})
        return base_version
    last = int(last)
    if last >= base_version:
        return last  # nothing new — no commit
    if any(f"_nn_{c}" not in tbl.read().columns for c in sum_cols):
        # pre-NULL-exactness layout: one-time stamped full rebuild
        full = _full(base.read(version=base_version))
        tbl.overwrite(full, extra_props={_WATERMARK: base_version})
        return base_version

    changes = base.changes_between(last, base_version)
    is_ins = F.col("_change_type").isin(*_INSERT_TYPES)
    sign = F.when(is_ins, F.lit(1)).otherwise(F.lit(-1))
    d_aggs = [F.sum(F.col(c) * sign).alias(f"_d_{c}") for c in sum_cols]
    d_aggs += [
        F.sum(
            F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
        ).alias(f"_d_nn_{c}")
        for c in sum_cols
    ]
    for c in min_cols:
        d_aggs.append(F.min(F.when(is_ins, F.col(c))).alias(f"_d_ins_min_{c}"))
        d_aggs.append(F.min(F.when(~is_ins, F.col(c))).alias(f"_d_del_min_{c}"))
    for c in max_cols:
        d_aggs.append(F.max(F.when(is_ins, F.col(c))).alias(f"_d_ins_max_{c}"))
        d_aggs.append(F.max(F.when(~is_ins, F.col(c))).alias(f"_d_del_max_{c}"))
    for c in distinct_cols:
        d_aggs.append(
            F.hll_sketch_agg(
                F.when(is_ins, F.col(c)), F.lit(_HLL_LGK)
            ).alias(f"_d_ins_sk_{c}")
        )
    if distinct_cols:
        # any retraction in the group invalidates its sketch (HLL can't
        # forget a value) — the targeted-rescan trigger
        d_aggs.append(
            F.sum(F.when(~is_ins, F.lit(1)).otherwise(F.lit(0))).alias(
                "_d_retractions"
            )
        )
    d_aggs.append(F.sum(sign).alias(f"_d_{_COUNT}"))
    delta = changes.groupBy(*group_cols).agg(*d_aggs)

    cur = tbl.read()
    merged = cur.join(
        delta, _null_safe_on(cur, delta, group_cols), "full_outer"
    )
    # matched rows have null-safe-equal keys, so coalescing the two
    # sides reconstructs the key (incl. a genuine NULL group) exactly
    keys = [F.coalesce(cur[c], delta[c]).alias(c) for c in group_cols]
    needs_rescan = _extrema_rescan_cond(cur, delta, min_cols, max_cols)
    if distinct_cols:
        needs_rescan = needs_rescan | (
            F.coalesce(delta["_d_retractions"], F.lit(0)) > 0
        )
    out_cols = list(keys)
    for c in sum_cols:
        nn = F.coalesce(cur[f"_nn_{c}"], F.lit(0)) + F.coalesce(
            delta[f"_d_nn_{c}"], F.lit(0)
        )
        raw = F.coalesce(cur[c], F.lit(0)) + F.coalesce(
            delta[f"_d_{c}"], F.lit(0)
        )
        # nn == 0 ⇒ the group holds no non-NULL values ⇒ SQL SUM is NULL
        out_cols.append(F.when(nn > 0, raw).alias(c))
        out_cols.append(nn.cast("long").alias(f"_nn_{c}"))
    out_cols += [
        F.least(cur[f"min_{c}"], delta[f"_d_ins_min_{c}"]).alias(f"min_{c}")
        for c in min_cols
    ]
    out_cols += [
        F.greatest(cur[f"max_{c}"], delta[f"_d_ins_max_{c}"]).alias(f"max_{c}")
        for c in max_cols
    ]
    for c in distinct_cols:
        cur_sk, ins_sk = cur[f"_sk_{c}"], delta[f"_d_ins_sk_{c}"]
        out_cols.append(
            F.when(cur_sk.isNull(), ins_sk)
            .when(ins_sk.isNull(), cur_sk)
            .otherwise(F.hll_union(cur_sk, ins_sk))
            .alias(f"_sk_{c}")
        )
    out_cols.append(
        (
            F.coalesce(cur[_COUNT], F.lit(0))
            + F.coalesce(delta[f"_d_{_COUNT}"], F.lit(0))
        ).alias(_COUNT)
    )
    merged = merged.select(*out_cols, needs_rescan.alias("_rescan")).filter(
        F.col(_COUNT) > 0
    )
    if distinct_cols:
        merged = merged.withColumns(
            {
                f"nd_{c}": F.hll_sketch_estimate(F.col(f"_sk_{c}"))
                for c in distinct_cols
            }
        )

    extra_props = {_WATERMARK: base_version}
    if min_cols or max_cols or distinct_cols:
        rescan_keys = merged.filter(F.col("_rescan")).select(*group_cols)
        # delta and cur are both group-cardinality-bounded, so this
        # count is cheap — and it is the audit trail that the fallback
        # touched only the invalidated groups, not the table
        extra_props[_LAST_RESCAN] = rescan_keys.count()
        survivors = merged.filter(~F.col("_rescan")).drop("_rescan")
        # recompute ONLY the invalidated groups from the pinned base
        # snapshot: broadcast the (group-cardinality-bounded) key set and
        # semi-join it against the base — the base is scanned once with
        # the extremum columns pruned, aggregated only for the affected
        # groups, never re-aggregated wholesale
        pinned = base.read(version=base_version)
        hit = pinned.join(
            F.broadcast(rescan_keys),
            _null_safe_on(pinned, rescan_keys, group_cols),
            "left_semi",
        )
        recomputed = _full(hit)
        merged = survivors.unionByName(recomputed)
    else:
        merged = merged.drop("_rescan")

    tbl.overwrite(merged, extra_props=extra_props)
    return base_version
