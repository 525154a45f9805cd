"""Slowly-changing-dimension maintenance (Type 1 and Type 2).

The reference's pattern doc declares member dims SCD Type 2
(``bronze_silver_gold/readme.md:56``) while the code implements Type 1
(``gold/gold_rx_claims_load.py:87-108``); the engine provides both —
Type 1 is ``ParquetTable.merge`` (attributes overwritten in place), and
this module adds true Type 2: every attribute change closes the current
version (``effective_to``, ``is_current=false``) and opens a new one, so
facts can join to the version effective at their event date.

State transition per applied batch (``apply_scd2``):

- new business key            -> insert version (open-ended, current)
- changed tracked attributes  -> close current version at ``as_of``,
                                 insert the new version
- unchanged / untouched keys  -> carried over unmodified

Re-applying the same batch is a no-op (idempotent, the medallion
guarantee); ``as_of`` is an explicit timestamp so runs are deterministic
and replayable.

Scale: one key-shuffle join between the update batch and the *current*
slice only (historic versions are carried by reference through the
table layer's rewrite); change detection is a null-safe comparison over
tracked columns — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

EFFECTIVE_FROM = "effective_from"
EFFECTIVE_TO = "effective_to"
IS_CURRENT = "is_current"


def _versioned(df: DataFrame, as_of) -> DataFrame:
    return (
        df.withColumn(EFFECTIVE_FROM, F.lit(as_of).cast("timestamp"))
        .withColumn(EFFECTIVE_TO, F.lit(None).cast("timestamp"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def apply_scd2(
    spark: SparkSession,
    table_root: str,
    updates: DataFrame,
    business_key: str,
    tracked_cols: Sequence[str],
    as_of: str,
) -> dict[str, int]:
    """Apply an update batch as SCD Type 2; returns change counts.

    The batch must carry one row per business key — duplicate keys would
    open multiple concurrent versions (two ``is_current`` rows) and
    corrupt every later apply, so they are rejected up front.
    """
    dupes = (
        updates.groupBy(business_key)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dupes:
        raise ValueError(
            f"updates batch has duplicate {business_key} values "
            f"(e.g. {dupes[0][0]!r}); dedup the batch (keep_latest) first"
        )
    if not is_table(table_root):
        ParquetTable.create(spark, table_root, _versioned(updates, as_of))
        return {"inserted": updates.count(), "versioned": 0, "unchanged": 0}

    tbl = ParquetTable.for_path(spark, table_root)
    dim = tbl.read()
    current = dim.filter(F.col(IS_CURRENT))
    historic = dim.filter(~F.col(IS_CURRENT))

    u, c = updates.alias("u"), current.alias("c")
    key_match = F.col(f"u.{business_key}") == F.col(f"c.{business_key}")
    attr_changed = F.lit(False)
    for col in tracked_cols:
        attr_changed = attr_changed | ~F.col(f"u.{col}").eqNullSafe(
            F.col(f"c.{col}")
        )

    joined = u.join(c, key_match, "left").cache()
    try:
        new_keys = joined.filter(F.col(f"c.{business_key}").isNull()).select("u.*")
        changed = joined.filter(
            F.col(f"c.{business_key}").isNotNull() & attr_changed
        ).select("u.*")
        n_inserted, n_versioned = new_keys.count(), changed.count()

        change_keys = changed.select(business_key)
        closed = (
            current.join(change_keys, business_key, "semi")
            .withColumn(EFFECTIVE_TO, F.lit(as_of).cast("timestamp"))
            .withColumn(IS_CURRENT, F.lit(False))
        )
        untouched = current.join(change_keys, business_key, "anti")
        new_versions = _versioned(changed.unionByName(new_keys), as_of)

        n_unchanged = updates.count() - n_inserted - n_versioned
        tbl.overwrite(
            historic.unionByName(closed)
            .unionByName(untouched)
            .unionByName(new_versions)
        )
        return {
            "inserted": n_inserted,
            "versioned": n_versioned,
            "unchanged": n_unchanged,
        }
    finally:
        joined.unpersist()


def current_view(spark: SparkSession, table_root: str) -> DataFrame:
    """The Type-1-equivalent slice: one current row per business key."""
    return (
        ParquetTable.for_path(spark, table_root)
        .read()
        .filter(F.col(IS_CURRENT))
        .drop(EFFECTIVE_TO, IS_CURRENT)
    )


def as_of_view(spark: SparkSession, table_root: str, ts: str) -> DataFrame:
    """Dimension as of ``ts``: the version whose validity interval covers
    it (time-travel over *business* time, complementing the table layer's
    commit-time travel)."""
    t = F.lit(ts).cast("timestamp")
    return (
        ParquetTable.for_path(spark, table_root)
        .read()
        .filter(
            (F.col(EFFECTIVE_FROM) <= t)
            & (F.col(EFFECTIVE_TO).isNull() | (F.col(EFFECTIVE_TO) > t))
        )
    )
