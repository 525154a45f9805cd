"""APPLY CHANGES INTO — declarative CDC apply for SCD1/SCD2 targets.

Databricks exposes this as the DLT ``APPLY CHANGES INTO`` statement (the
reference's platform docs assume it around the notebooks' MERGE-based
CDC, ``bronze_silver_gold/readme.md:42-70``); this module provides the
ENGINE primitive: given any keyed change feed — this repo's CDF stream,
a Debezium/Kafka-shaped frame, or a plain batch of events — apply it to
a versioned table as

- **SCD Type 1** (``scd_type=1``): one row per key holding the latest
  values; out-of-order events resolved by a ``sequence_by`` column, and
  the applied sequence persisted per row (``__apply_sequence``) so LATE
  events — arriving in a later batch with an OLDER sequence — are
  dropped instead of clobbering newer data.  Replaying a batch is a
  no-op (equal sequence does not re-apply).
- **SCD Type 2** (``scd_type=2``): full history; every change opens a
  version (``effective_from`` = its sequence value) and closes the
  previous one; deletes close the current version without opening a new
  one.  Interoperates with :mod:`operators.scd`'s ``current_view`` /
  ``as_of_view``.

Semantics pinned down (the parts DLT documents and users rely on):

- **Within a batch**, events for one key apply in ``sequence_by``
  order.  SCD1 keeps only the final state per key (one MERGE, not one
  per event); SCD2 materializes every intermediate version set-wise —
  a ``lead()`` window supplies each version's ``effective_to``, so a
  key with N changes in one batch costs N rows, never N passes.
- **Exact sequence ties** between a delete and an upsert resolve to
  the delete (deterministic; documented rather than arbitrary).
- **No-change suppression (SCD2)**: an event whose payload equals the
  previous state null-safely opens no version — replays and idle
  heartbeats don't balloon history.
- **Deletes** (``apply_as_deletes`` predicate): SCD1 removes the row
  physically; a later batch carrying an event OLDER than the delete
  re-inserts it (no tombstone is retained — stated caveat; use SCD2
  when deletes must be total orders).  SCD2 closes the version, so the
  same late event is refused by the sequence floor.
- **Out-of-order floor**: events at-or-below the target's applied
  sequence for their key are skipped.  SCD2's floor is the key's
  applied FRONTIER — ``max(coalesce(effective_to, effective_from))``
  over all its versions — so a delete's close time fences late events
  even though no current row remains; events that would have to SPLIT
  a historic interval (sequence inside a closed version) are dropped
  the same way — per-key sequences are expected to be monotone-ish,
  exactly DLT's contract.  SCD2 sequences must be timestamp-castable
  (they become ``effective_from``); SCD1 accepts any ordered type.

Scale: every path is one key-shuffle join against a column-pruned
slice of the target plus one table-layer MERGE (cost ∝ changed
partitions, not table size — the same reason ``gold.stream`` rides
MERGE rather than overwrite).  SCD2 never rewrites history: versions
are closed by a MERGE keyed on (business key, effective_from), so
untouched files carry over by reference.  No ``collect()`` beyond the
returned batch counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_databricks_lakehouse_spark.operators.scd import (
    EFFECTIVE_FROM,
    EFFECTIVE_TO,
    IS_CURRENT,
)
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

APPLY_SEQ = "__apply_sequence"
_DEL = "__is_delete"


def _normalize(
    source: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    apply_as_deletes: str | None,
    except_columns: Sequence[str],
) -> DataFrame:
    missing = [c for c in [*keys, sequence_by] if c not in source.columns]
    if missing:
        raise ValueError(
            f"change feed is missing required columns {missing}; "
            f"it has {source.columns}"
        )
    flag = (
        F.coalesce(F.expr(apply_as_deletes), F.lit(False))
        if apply_as_deletes
        else F.lit(False)
    )
    drop = [c for c in except_columns if c in source.columns]
    return source.withColumn(_DEL, flag).drop(*drop)


def _latest_per_key(ev: DataFrame, keys: Sequence[str], seq: str) -> DataFrame:
    # final state per key: highest sequence wins; at an exact tie the
    # delete outranks the upsert (deterministic, documented above)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq).desc(), F.col(_DEL).desc()
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes_batch(
    spark: SparkSession,
    target_root: str,
    source: DataFrame,
    *,
    keys: Sequence[str],
    sequence_by: str,
    apply_as_deletes: str | None = None,
    except_columns: Sequence[str] = (),
    scd_type: int = 1,
    evolve_schema: bool = False,
) -> dict[str, int]:
    """Apply one batch of change events; returns per-batch counts.

    The batch core — :func:`apply_changes` wraps it in ``foreachBatch``
    for streaming feeds, and batch CDC loads (a day of Debezium files)
    call it directly.

    ``evolve_schema`` (opt-in, the MERGE ``evolve_schema`` contract):
    a CDC feed that gained columns widens the target through the
    apply commit — SCD1 post-images and SCD2 new versions carry the
    new column, already-stored rows (and SCD2's closed versions) read
    NULL for it.  Without the flag a wider feed raises loudly.
    """
    if scd_type not in (1, 2):
        raise ValueError(f"scd_type must be 1 or 2, got {scd_type!r}")
    ev = _normalize(source, keys, sequence_by, apply_as_deletes, except_columns)
    if scd_type == 1:
        return _apply_scd1(
            spark, target_root, ev, list(keys), sequence_by,
            evolve=evolve_schema,
        )
    return _apply_scd2_feed(
        spark, target_root, ev, list(keys), sequence_by,
        evolve=evolve_schema,
    )


def _apply_scd1(
    spark: SparkSession,
    root: str,
    ev: DataFrame,
    keys: list[str],
    seq: str,
    evolve: bool = False,
) -> dict[str, int]:
    latest = _latest_per_key(ev, keys, seq)
    payload_cols = [c for c in latest.columns if c != _DEL]

    if not is_table(root):
        first = (
            latest.filter(~F.col(_DEL))
            .drop(_DEL)
            .withColumn(APPLY_SEQ, F.col(seq))
        )
        n = first.count()
        if n == 0:
            return {"upserted": 0, "deleted": 0, "skipped_late": 0}
        ParquetTable.create(spark, root, first)
        return {"upserted": n, "deleted": 0, "skipped_late": 0}

    tbl = ParquetTable.for_path(spark, root)
    target_cols = tbl.read().columns
    # a feed that gained columns is schema evolution — gate it HERE
    # (same early check as _apply_scd2_feed, with THIS surface's error)
    # so the failure names APPLY CHANGES ... WITH SCHEMA EVOLUTION and
    # fires before the dedup/count jobs run, instead of surfacing
    # merge()'s generic MERGE-flavored message afterwards
    new_cols = [
        c
        for c in payload_cols
        if c not in target_cols and c not in (*keys, seq)
    ]
    if new_cols and not evolve:
        raise ValueError(
            f"change feed carries new columns {sorted(new_cols)}; "
            "pass evolve_schema=True (SQL: APPLY CHANGES ... WITH "
            "SCHEMA EVOLUTION) to widen the target"
        )
    # sequence floor: column-pruned target slice, one key-shuffle join;
    # strictly-greater keeps replays of an applied batch no-ops
    floor = tbl.read().select(*keys, F.col(APPLY_SEQ).alias("__floor"))
    survivors = (
        latest.join(floor, keys, "left")
        .filter(F.col("__floor").isNull() | (F.col(seq) > F.col("__floor")))
        .drop("__floor")
    )
    n_total = latest.count()
    n_del = survivors.filter(F.col(_DEL)).count()
    n_up = survivors.filter(~F.col(_DEL)).count()
    if n_del + n_up == 0:
        return {"upserted": 0, "deleted": 0, "skipped_late": n_total}
    merged = survivors.select(
        *payload_cols, F.col(seq).alias(APPLY_SEQ), F.col(_DEL)
    )
    tbl.merge(
        merged,
        on=keys,
        when_matched_delete=F.col(_DEL),
        source_meta_cols=[_DEL],
        evolve_schema=evolve,
    )
    return {
        "upserted": n_up,
        "deleted": n_del,
        "skipped_late": n_total - n_del - n_up,
    }


def _apply_scd2_feed(
    spark: SparkSession,
    root: str,
    ev: DataFrame,
    keys: list[str],
    seq: str,
    evolve: bool = False,
) -> dict[str, int]:
    payload_cols = [c for c in ev.columns if c not in (_DEL,)]
    tracked = [c for c in payload_cols if c not in (*keys, seq)]

    # one event per (key, sequence): tie -> delete wins
    wd = Window.partitionBy(*keys, seq).orderBy(F.col(_DEL).desc())
    ev = (
        ev.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if is_table(root):
        tbl = ParquetTable.for_path(spark, root)
        dim = tbl.read()
        # a feed that gained columns is schema evolution — gate it HERE
        # (before any projection reads the stored rows) so the no-flag
        # failure is this contract's error, not an unresolved-column
        # AnalysisException from the suppression join below
        new_cols = [c for c in tracked if c not in dim.columns]
        if new_cols and not evolve:
            raise ValueError(
                f"change feed carries new columns {sorted(new_cols)}; "
                "pass evolve_schema=True (SQL: APPLY CHANGES ... WITH "
                "SCHEMA EVOLUTION) to widen the target"
            )
        current = dim.filter(F.col(IS_CURRENT))
        # the key's applied frontier is the latest instant any version
        # covers — effective_to where closed (a DELETE leaves no current
        # row, but its close time still fences late events), else the
        # open version's effective_from
        floor = dim.groupBy(*keys).agg(
            F.max(
                F.coalesce(F.col(EFFECTIVE_TO), F.col(EFFECTIVE_FROM))
            ).alias("__floor")
        )
        ev_types = dict(ev.dtypes)
        curvals = current.select(
            *keys,
            F.lit(True).alias("__has_cur"),
            *[
                # stored rows predate an evolving column: their state
                # for it is NULL, so the first evolved event always
                # differs and opens a version (never suppressed)
                (
                    F.col(c)
                    if c in dim.columns
                    else F.lit(None).cast(ev_types[c])
                ).alias(f"__cur_{c}")
                for c in tracked
            ],
        )
        ev = (
            ev.join(floor, keys, "left")
            .join(curvals, keys, "left")
            .filter(
                F.col("__floor").isNull()
                | (F.col(seq).cast("timestamp") > F.col("__floor"))
            )
        )
    else:
        tbl = None
        ev = ev.withColumn("__floor", F.lit(None).cast("timestamp"))
        ev = ev.withColumn("__has_cur", F.lit(False))
        for c in tracked:
            ev = ev.withColumn(f"__cur_{c}", F.lit(None).cast(dict(ev.dtypes)[c]))

    # no-change suppression: an upsert equal (null-safely) to the state
    # just before it — previous event in the batch, else the stored
    # current version — opens no version.  Deletes always act.
    wseq = Window.partitionBy(*keys).orderBy(F.col(seq))
    prev_state = lambda c: F.lag(  # noqa: E731 — tight closure, not an op
        F.when(~F.col(_DEL), F.col(c))
    ).over(wseq)
    prev_was_del = F.coalesce(F.lag(F.col(_DEL)).over(wseq), F.lit(False))
    same = F.lit(True)
    for c in tracked:
        # compare to the in-batch predecessor when one exists, else the
        # stored current values joined above
        base = F.when(
            F.lag(F.col(seq)).over(wseq).isNotNull(), prev_state(c)
        ).otherwise(F.col(f"__cur_{c}"))
        same = same & F.col(c).eqNullSafe(base)
    had_state = F.when(
        F.lag(F.col(seq)).over(wseq).isNotNull(), ~prev_was_del
    ).otherwise(F.coalesce(F.col("__has_cur"), F.lit(False)))
    ev = (
        ev.withColumn("__keep", F.col(_DEL) | ~(same & had_state))
        .filter(F.col("__keep"))
        .drop("__keep")
    )

    # set-wise versioning: effective_to = next surviving event's sequence
    ev = ev.withColumn("__next", F.lead(F.col(seq)).over(wseq))

    new_versions = (
        ev.filter(~F.col(_DEL))
        .select(
            *[F.col(c) for c in payload_cols],
            F.col(seq).cast("timestamp").alias(EFFECTIVE_FROM),
            F.col("__next").cast("timestamp").alias(EFFECTIVE_TO),
            F.col("__next").isNull().alias(IS_CURRENT),
        )
        .drop(seq)
    )
    n_versions = new_versions.count()

    if tbl is None:
        if n_versions == 0:
            return {"versioned": 0, "closed": 0}
        ParquetTable.create(spark, root, new_versions)
        return {"versioned": n_versions, "closed": 0}

    # close the stored current version of every touched key at the
    # FIRST surviving event (delete or upsert) — post-image rows merged
    # on (keys, effective_from), so history files carry by reference
    touched = ev.groupBy(*keys).agg(
        F.min(F.col(seq).cast("timestamp")).alias("__close_at")
    )
    closed = (
        current.join(touched, keys, "inner")
        .withColumn(EFFECTIVE_TO, F.col("__close_at"))
        .withColumn(IS_CURRENT, F.lit(False))
        .drop("__close_at")
    )
    n_closed = closed.count()
    if n_versions + n_closed == 0:
        return {"versioned": 0, "closed": 0}
    # under evolution the closed (old-schema) versions NULL-fill the
    # feed's new columns; without it a width mismatch raises in merge
    tbl.merge(
        closed.unionByName(new_versions, allowMissingColumns=evolve),
        on=[*keys, EFFECTIVE_FROM],
        evolve_schema=evolve,
    )
    return {"versioned": n_versions, "closed": n_closed}


def apply_changes(
    spark: SparkSession,
    target_root: str,
    source: DataFrame,
    *,
    keys: Sequence[str],
    sequence_by: str,
    checkpoint: str,
    apply_as_deletes: str | None = None,
    except_columns: Sequence[str] = (),
    scd_type: int = 1,
    evolve_schema: bool = False,
    available_now: bool = True,
):
    """Continuously apply a streaming change feed into ``target_root``.

    ``source`` is any streaming DataFrame shaped as change events (this
    repo's ``table_changes`` CDF stream, a file stream of CDC exports,
    a rate-source test harness...).  Offsets live in the stream
    checkpoint; each micro-batch routes through
    :func:`apply_changes_batch`, whose sequence floor makes replayed
    batches no-ops — together: exactly-once table state.
    """
    if not source.isStreaming:
        raise ValueError(
            "source is a batch DataFrame — call apply_changes_batch"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes_batch(
            batch_df.sparkSession,
            target_root,
            batch_df,
            keys=keys,
            sequence_by=sequence_by,
            apply_as_deletes=apply_as_deletes,
            except_columns=except_columns,
            scd_type=scd_type,
            evolve_schema=evolve_schema,
        )

    writer = (
        source.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
