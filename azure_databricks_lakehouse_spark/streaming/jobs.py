"""Structured Streaming jobs: the reference's documented evolution path.

The reference runs batch pipelines with streaming *affordances* — a
manual watermark table (ST1, ``silver/silver_rx_claims_load.py:29-63``),
``checkpointLocation`` options on batch writes (ST2,
``bronze/bronze_rx_claims_load.py:21,62,73`` — a no-op there; real here),
and docs pointing at continuous ETL / streaming ingestion (ST3/ST4,
``README.md:20,63``).  This module implements the real thing on
Structured Streaming:

- ``read_file_stream``: file-source streaming ingestion (ST4) — the OSS
  equivalent of Auto Loader; new files under a path become micro-batches,
  offsets tracked in the checkpoint (replacing the hand-rolled watermark
  table).
- ``tumbling_counts``: event-time windowed aggregation with
  ``withWatermark`` bounding state (late-data handling, ST5).
- ``dedup_stream``: streaming keep-first dedup via
  ``dropDuplicatesWithinWatermark`` — the streaming analog of the Silver
  batch dedup (``silver/silver_rx_claims_load.py:159-179``); state for a
  key is dropped once the watermark passes it.
- ``write_stream_to_table``: ``foreachBatch`` sink into the parquet-native
  table layer — append or MERGE per micro-batch (ST3; the
  ``foreachBatch``-MERGE pattern the Delta docs prescribe for streaming
  upserts), with ``checkpointLocation`` giving exactly-once table commits
  across restarts (ST2).

All entry points accept ``availableNow`` triggering so batch-like runs
(and tests) drain the backlog and stop — the OSS equivalent of the
reference's scheduled-batch orchestration.

Scale: windowed-agg state is bounded by (watermark horizon x group
cardinality); dedup state by keys within the horizon.  foreachBatch MERGE
inherits the table layer's partition-pruned rewrite when the partition
key is part of the merge key.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from azure_databricks_lakehouse_spark.functions.numeric import dec_sum
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """ST4: stream new files under ``path`` (schema must be explicit —
    streaming sources don't infer).  ``max_files_per_trigger`` bounds the
    micro-batch (availableNow then drains the backlog in several
    batches — how tests exercise cross-batch state)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_rate_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    start_timestamp_ms: int = 0,
    advance_ms: int = 1000,
) -> DataFrame:
    """ST4 (non-file modality): an unbounded generator source —
    ``rate-micro-batch`` emits exactly ``rows_per_batch`` rows of
    ``(timestamp, value)`` per trigger with event time advancing
    ``advance_ms`` per batch, deterministically.

    This is the broker-shaped half of the ingestion surface: unlike the
    file source there is no backlog listing — offsets are ranges over an
    unbounded sequence, exactly the Kafka contract (the connector jar is
    not bundled with this Spark distribution — probe recorded in
    COVERAGE.md; swapping ``format("kafka") + subscribe`` into this same
    plumbing is the production path).  Deterministic batches make it the
    right harness for exercising cross-batch state (windows, dedup,
    foreachBatch MERGE) without a broker."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", start_timestamp_ms)
        .option("advanceMillisPerBatch", advance_ms)
        .load()
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window rollup; watermark bounds agg state and
    defines lateness tolerance (ST5)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST5: streaming exact dedup; duplicate arrivals within the watermark
    horizon are dropped, state auto-expires beyond it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with bounded state (ST-extension): the
    canonical impressions⋈clicks shape.  Both sides carry a watermark
    and the join condition carries the event-time range
    ``left_ts <= right_ts <= left_ts + within`` — together they let
    Spark EXPIRE buffered rows (without the range, inner-join state
    grows forever and outer joins are refused outright).

    ``how``: ``inner``, ``leftOuter``, ``rightOuter``, ``fullOuter`` —
    outer rows NULL-pad the other side and emit only once the watermark
    proves no match can still arrive (late-binding, exactly Spark's
    contract).  Key columns are emitted once (from the left); each
    side's remaining columns keep their names, so they must not
    collide.

    100 TB stance: the join shuffles both streams on the keys once; per
    key+time-bucket state is O(rows within the watermark horizon), not
    O(stream length)."""
    joined_how = {
        "inner": "inner",
        "leftOuter": "leftOuter",
        "rightOuter": "rightOuter",
        "fullOuter": "fullOuter",
    }.get(how)
    if joined_how is None:
        raise ValueError(
            f"how={how!r}; stream-stream joins support inner/leftOuter/"
            "rightOuter/fullOuter"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns collide across sides: {sorted(overlap)}; "
            "rename before joining"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in keys:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    out = l.join(r, cond, joined_how)
    # emit key columns once; a fullOuter row may have them only on one
    # side, so coalesce
    others = [
        F.col(f"l.{c}") for c in left.columns if c not in keys
    ] + [F.col(f"r.{c}") for c in right.columns if c not in keys]
    return out.select(
        *[
            F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
            for k in keys
        ],
        *others,
    )


def write_stream_to_table(
    df: DataFrame,
    table_root: str,
    checkpoint: str,
    merge_on: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    output_mode: str = "append",
    available_now: bool = True,
    txn_app: str | None = None,
) -> StreamingQuery:
    """ST2/ST3: checkpointed foreachBatch sink into a versioned table.

    ``merge_on`` upserts each micro-batch (streaming MERGE); otherwise
    appends.  The checkpoint makes replays idempotent at the micro-batch
    level; with MERGE the sink is also idempotent at the row level, so
    end-to-end exactly-once does not depend on the sink's dedup.

    ``txn_app`` gives the APPEND path row-level exactly-once too,
    without MERGE's target rewrite: each micro-batch appends with
    ``(txn_app, batch_id)`` and a replayed batch (crash after the table
    commit but before the checkpoint advanced) skips at metadata cost.
    In txn mode the bootstrap creates the table empty and appends
    through the same guarded path, so even the first batch cannot
    double-land.  Mutually exclusive with ``merge_on``.

    CAVEAT (Delta's "new checkpoint needs a new appId" rule): batch ids
    are a per-checkpoint sequence, so ``txn_app`` must be unique per
    checkpoint lineage — derive it from the checkpoint path if unsure.
    Reusing an app id with a FRESH checkpoint makes the old watermark
    swallow the new lineage's batches: identical re-runs of an unchanged
    source dedupe (sometimes wanted), but if the source has grown, the
    new data is silently lost.
    """
    if txn_app is not None and merge_on:
        raise ValueError("txn_app applies to the append path; drop merge_on")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if not is_table(table_root):
            ParquetTable.create(
                spark,
                table_root,
                batch_df.limit(0) if txn_app is not None else batch_df,
                partition_by=partition_by,
            )
            if txn_app is None:
                return
        tbl = ParquetTable.for_path(spark, table_root)
        if merge_on:
            tbl.merge(batch_df, on=list(merge_on))
        elif txn_app is not None:
            tbl.append(batch_df, txn_app=txn_app, txn_version=batch_id)
        else:
            tbl.append(batch_df)

    writer = (
        df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _checkpoint_lineage(checkpoint: str) -> str:
    """The streaming query id Spark persists in ``<checkpoint>/metadata``
    — the correct scope for transactional-append app ids, because batch
    ids are a per-LINEAGE sequence: a recreated checkpoint directory
    (same path) mints a new query id and restarts batch ids at 0, and a
    path-derived app id would let the old lineage's watermark silently
    swallow the new lineage's batches (Delta's "new checkpoint needs a
    new appId" rule).  Falls back to the normalized path for opaque
    checkpoint stores (restart-stable, but NOT recreate-safe)."""
    import json

    ckpt_key = os.path.normpath(os.path.abspath(checkpoint))
    try:
        with open(os.path.join(ckpt_key, "metadata")) as fh:
            return json.load(fh)["id"]
    except (OSError, ValueError, KeyError):
        return ckpt_key


def write_deduped_stream(
    docs: DataFrame,
    table_root: str,
    index_root: str,
    checkpoint: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_containment: float = 0.5,
    k: int = 8,
    w: int = 4,
    max_len: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming ingestion with ingestion-time dedup: every micro-batch is
    screened against the PERSISTED corpus fingerprint index
    (:func:`~azure_databricks_lakehouse_spark.operators.fingerprints.dedup_batch_against_index`)
    before landing — near-duplicates of anything already ingested never
    reach the destination table, and each kept document's fingerprints
    join the index so the NEXT batch screens against them.

    Idempotency under micro-batch replay: both sinks are transactional
    APPENDS keyed on the micro-batch id (``txn_app``/``txn_version`` —
    the Delta streaming-sink contract), so a replayed batch skips at
    metadata cost any commit that already landed and re-applies the one
    that didn't.  Within a lineage a batch's own fingerprints are never
    in the index when the screen runs (the index append is the LAST
    commit of the batch), so replays re-screen against exactly the
    pre-batch corpus.

    The txn app ids are derived from the STREAMING QUERY ID Spark
    persists in the checkpoint's ``metadata`` file, because batch ids
    are a per-lineage sequence: any fresh checkpoint — a new path OR a
    deleted-and-recreated directory at the same path — mints a new
    query id, restarts batch ids at 0, and must get fresh app ids or
    the old lineage's watermark would silently swallow every new batch
    (permanent data loss, Delta's "new checkpoint needs a new appId"
    rule).  A fresh checkpoint over an already-ingested source is SAFE:
    previously ingested documents match their own index entries
    (containment 1) and reject, so they cannot land twice — the index
    is the memory, the checkpoint only the offset ledger.  The same
    self-match semantics make a pre-built index (e.g. fingerprints of a
    corpus stored elsewhere) act as a suppression list.

    Screening is batch-vs-CORPUS only; duplicates WITHIN one micro-batch
    are the upstream job of :func:`dedup_stream` /
    ``dropDuplicatesWithinWatermark`` (the standard split: within-stream
    dedup is watermark-stateful, cross-corpus dedup is index-probed).

    Scale note: every per-batch write is additive — the screening probe
    is map-side over the index (batch fingerprints broadcast — cost
    independent of corpus size) and both sinks append O(batch) rows
    with a metadata-only replay guard, so nothing in the loop ever
    rewrites corpus-scale files. The composition seam — screen, land,
    extend index, all inside one checkpointed ``foreachBatch`` — is
    exactly what a 100 TB deployment runs."""
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        dedup_batch_against_index,
        winnow_fingerprints_long,
    )

    # batch ids are a per-LINEAGE sequence, so the txn app ids must be
    # scoped to the checkpoint LINEAGE, not its path: Spark persists a
    # streaming query id in `<checkpoint>/metadata` at query start and
    # re-mints it iff the checkpoint directory is recreated (Delta's
    # approach).  Path-derived ids fail exactly there — delete the
    # checkpoint dir, restart at the SAME path, and batch ids restart
    # at 0 under the old app id, so the stale watermark silently skips
    # every batch up to it (self-rejection only protects documents the
    # index has seen; genuinely new docs in those batches are lost).
    # Read lazily inside the sink: the metadata file exists by the time
    # the first micro-batch runs, not when the writer is built.
    def _lineage_id() -> str:
        return _checkpoint_lineage(checkpoint)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lineage = _lineage_id()
        docs_txn = f"deduped-stream-docs:{lineage}"
        index_txn = f"deduped-stream-index:{lineage}"
        spark = batch_df.sparkSession
        # bootstrap: create whichever table is missing as EMPTY, then fall
        # through to the one guarded-append path.  Creating data-bearing
        # tables here would open a crash window between the two commits
        # that a replay cannot recover from (one table exists, the other
        # doesn't, and neither branch fits); empty creates are idempotent
        # under any partial-crash state and the appends below do the rest.
        if not is_table(table_root):
            ParquetTable.create(spark, table_root, batch_df.limit(0))
        if not is_table(index_root):
            ParquetTable.create(
                spark,
                index_root,
                winnow_fingerprints_long(
                    batch_df.limit(0), text_col=text_col, id_col=id_col,
                    k=k, w=w, max_len=max_len,
                ),
            )
        index_tbl = ParquetTable.for_path(spark, index_root)
        # the batch screens against the FULL index, own ids included: a
        # document re-arriving across lineages (fresh checkpoint, or an
        # index pre-built elsewhere) matches its own entries with
        # containment 1 and rejects — which is what keeps re-ingestion
        # from landing duplicates in the docs table or doubling fp rows
        # in the index.  Within this lineage self-matches cannot occur:
        # the index append is the batch's last commit, so a replayed
        # batch's own fps are never in the index at screen time.
        kept, _rejected, new_rows = dedup_batch_against_index(
            batch_df,
            index_tbl.read(),
            text_col=text_col,
            id_col=id_col,
            k=k,
            w=w,
            max_len=max_len,
            min_containment=min_containment,
            # run the index probe once, not once per sink below
            materialize=True,
        )
        docs_tbl = ParquetTable.for_path(spark, table_root)
        docs_tbl.append(kept, txn_app=docs_txn, txn_version=batch_id)
        # cluster the appended slice by fp so the persisted index keeps
        # the fp co-location its consumers assume (winnow_fingerprints_long
        # cluster_by_fp); periodic OPTIMIZE compacts the per-batch files
        index_tbl.append(
            new_rows.repartition("fp"), txn_app=index_txn, txn_version=batch_id
        )

    writer = (
        docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_importance_screened_stream(
    docs: DataFrame,
    table_root: str,
    model_root: str,
    checkpoint: str,
    *,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "importance",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming DSIR / quality screen (round-8 verdict item 7): every
    micro-batch is scored against a PERSISTED
    :class:`~azure_databricks_lakehouse_spark.operators.dsir.ImportanceModel`
    (:func:`~azure_databricks_lakehouse_spark.operators.dsir.persist_importance_model`)
    and only documents with importance ≥ ``threshold`` land — the
    ingestion-time twin of the batch
    ``prepare_training_corpus`` dsir stage, composing with
    :func:`write_deduped_stream` the way the fingerprint screen does.

    The landed rows CARRY the score (``score_col``), so batch and
    streaming runs are auditable against each other: scoring folds
    per-document contributions bucket-sorted, making the double
    bit-identical under any partitioning — the same corpus scored in
    one batch job or drip-fed through this sink produces byte-equal
    (id, score) pairs.

    Model refresh is atomic and per-batch: the model table is re-read
    each micro-batch (one manifest read — metadata-paced), so an
    overwritten fit (new exemplars, larger dim) applies from the next
    batch without restarting the stream; readers never see a torn
    model because the overwrite is one commit.

    Idempotency under replay: the sink is a transactional append keyed
    on the micro-batch id, app-id scoped to the checkpoint lineage
    (:func:`_checkpoint_lineage`) — a replayed batch skips at metadata
    cost, a recreated checkpoint re-screens but cannot double-land what
    its own lineage already committed.

    Scale: the only non-batch-sized input is the model's ``dim``-row
    ratio table (KBs — broadcast by ``score_importance``); the screen
    is a projection + one (id, bucket) aggregate over the batch.  The
    model table is read per batch but never scanned beyond its
    ``dim`` rows."""
    from azure_databricks_lakehouse_spark.operators.dsir import (
        load_importance_model,
        score_importance,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        model = load_importance_model(spark, model_root)
        scored = score_importance(
            batch_df, model, id_col=id_col, text_col=text_col,
            out_col=score_col,
        )
        kept = scored.filter(F.col(score_col) >= F.lit(threshold))
        if not is_table(table_root):
            ParquetTable.create(spark, table_root, kept.limit(0))
        ParquetTable.for_path(spark, table_root).append(
            kept,
            txn_app=f"dsir-screen:{_checkpoint_lineage(checkpoint)}",
            txn_version=batch_id,
        )

    writer = (
        docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_table_stream(
    spark: SparkSession,
    root: str,
    *,
    starting_version: int | None = None,
    skip_change_commits: bool = False,
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """Delta ``readStream`` parity: a lakehouse table as a streaming
    SOURCE of appended rows — the table-to-table pipeline primitive
    (bronze streams into silver as rows land, no CDC columns in sight).

    Thin composition over the CDF source (`sources/cdf_stream`): append
    commits stream their added files; a commit that REMOVES rows raises
    by default — matching Delta, where a plain table stream refuses
    updates/deletes so a consumer can never silently miss a retraction —
    and ``skip_change_commits=True`` (Delta's ``skipChangeCommits``)
    opts into skipping such commits wholesale.  The CDC metadata
    columns are projected away; pair with
    :func:`write_stream_to_table`'s checkpointed sinks for exactly-once
    table-to-table flows.
    """
    from azure_databricks_lakehouse_spark.sources.cdf_stream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    reader = (
        spark.readStream.format("table_changes")
        .option("path", root)
        # appends-only contract: rewrite commits raise EVEN when they
        # carry a CDC sidecar — a plain stream has no _change_type to
        # mark a retraction, so sidecar rows would arrive as appends
        .option("plainStream", "true")
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if skip_change_commits:
        reader = reader.option("skipChangeCommits", "true")
    if max_versions_per_trigger is not None:
        reader = reader.option(
            "maxVersionsPerTrigger", str(max_versions_per_trigger)
        )
    return reader.load().drop(
        "_change_type", "_commit_version", "_commit_timestamp"
    )
