"""Structured Streaming tests: file-source ingestion, watermarked windowed
aggregation, streaming dedup, checkpointed foreachBatch MERGE with
restart/exactly-once semantics (ST2-ST5)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.tables import ParquetTable
from azure_databricks_lakehouse_spark.streaming import (
    dedup_stream,
    read_file_stream,
    tumbling_counts,
    write_stream_to_table,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, m), u, et, v) for i, m, u, et, v in rows],
        _SCHEMA,
    )


def _run(query):
    query.awaitTermination(120)


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    return {
        "src": src,
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_windowed_agg_stream(spark, dirs):
    _events(
        spark,
        [
            (1, 0, 1, "click", 1.0),
            (2, 5, 1, "click", 2.0),
            (3, 12, 2, "view", 3.0),
        ],
    ).write.mode("append").parquet(dirs["src"])
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    q = write_stream_to_table(
        tumbling_counts(stream),
        dirs["out"],
        dirs["ckpt"],
        merge_on=["window_start", "event_type"],
        output_mode="update",
    )
    _run(q)
    got = {
        (r["window_start"].minute, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ParquetTable.for_path(spark, dirs["out"]).read().collect()
    }
    assert got == {(0, "click"): (2, 3.0), (10, "view"): (1, 3.0)}


def test_dedup_stream_drops_duplicates(spark, dirs):
    _events(
        spark,
        [
            (1, 0, 1, "click", 1.0),
            (1, 0, 1, "click", 1.0),  # exact duplicate arrival
            (2, 5, 2, "view", 2.0),
        ],
    ).write.mode("append").parquet(dirs["src"])
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    q = write_stream_to_table(
        dedup_stream(stream, keys=["event_id"]), dirs["out"], dirs["ckpt"]
    )
    _run(q)
    out = ParquetTable.for_path(spark, dirs["out"]).read()
    assert out.count() == 2
    assert {r["event_id"] for r in out.collect()} == {1, 2}


def test_checkpoint_restart_exactly_once(spark, dirs):
    _events(spark, [(1, 0, 1, "click", 1.0)]).write.mode("append").parquet(
        dirs["src"]
    )
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], dirs["ckpt"]))
    assert ParquetTable.for_path(spark, dirs["out"]).read().count() == 1

    # restart with the same checkpoint and no new files: nothing re-emitted
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], dirs["ckpt"]))
    assert ParquetTable.for_path(spark, dirs["out"]).read().count() == 1

    # new file lands -> only the delta is processed on the next run
    _events(spark, [(2, 1, 1, "view", 2.0)]).write.mode("append").parquet(
        dirs["src"]
    )
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], dirs["ckpt"]))
    out = ParquetTable.for_path(spark, dirs["out"]).read()
    assert out.count() == 2
    assert {r["event_id"] for r in out.collect()} == {1, 2}


def test_streaming_merge_upserts(spark, dirs):
    _events(spark, [(1, 0, 1, "click", 1.0)]).write.mode("append").parquet(
        dirs["src"]
    )
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], dirs["ckpt"], merge_on=["event_id"]))

    # re-send event 1 with a corrected value + a new event
    _events(spark, [(1, 0, 1, "click", 9.0), (3, 2, 2, "view", 3.0)]).write.mode(
        "append"
    ).parquet(dirs["src"])
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], dirs["ckpt"], merge_on=["event_id"]))

    out = ParquetTable.for_path(spark, dirs["out"]).read()
    assert out.count() == 2  # events 1 (updated) and 3
    got = {r["event_id"]: r["value"] for r in out.collect()}
    assert got == {1: 9.0, 3: 3.0}


def test_stateful_running_totals_across_batches(spark, dirs):
    from azure_databricks_lakehouse_spark.streaming.stateful import running_totals

    # two files + maxFilesPerTrigger=1 -> two micro-batches in one
    # availableNow run; state must carry batch 1 into batch 2
    _events(spark, [(1, 0, 7, "click", 1.0), (2, 1, 8, "view", 2.0)]).coalesce(
        1
    ).write.mode("append").parquet(dirs["src"])
    _events(spark, [(3, 2, 7, "click", 4.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["src"])

    stream = read_file_stream(spark, dirs["src"], _SCHEMA, max_files_per_trigger=1)
    q = write_stream_to_table(
        running_totals(stream),
        dirs["out"],
        dirs["ckpt"],
        merge_on=["user_id"],
        output_mode="update",
    )
    _run(q)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in ParquetTable.for_path(spark, dirs["out"]).read().collect()
    }
    assert got == {7: (2, 5.0), 8: (1, 2.0)}


def test_rate_stream_windowed_agg(spark):
    """Broker-shaped (non-file) ingestion: the rate-micro-batch source
    emits deterministic (timestamp, value) batches over an unbounded
    offset sequence — the Kafka contract without a broker.  Windowed agg
    over it exercises the same plumbing a kafka read would feed."""
    import time

    from azure_databricks_lakehouse_spark.streaming import read_rate_stream

    stream = read_rate_stream(
        spark, rows_per_batch=100, start_timestamp_ms=0, advance_ms=1000
    )
    windowed = (
        stream.withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "1 second").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    name = "rate_agg_sink"
    q = (
        windowed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.table(name).collect()
            # >= 3 one-second windows of exactly 100 rows each
            full = [r for r in rows if r["n"] == 100]
            if len(full) >= 3:
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"rate stream never filled 3 windows: {rows}")
        assert all(r["n"] == 100 for r in rows[:-1] or rows)
    finally:
        q.stop()


# --- streaming ingestion with cross-corpus dedup ---------------------------
_DOC_SCHEMA = "doc_id long, text string"


def test_deduped_stream_screens_across_batches(spark, tmp_path):
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        write_deduped_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    dest, idx, ckpt = (
        str(tmp_path / "dest"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )

    def _ingest():
        stream = read_file_stream(spark, src, _DOC_SCHEMA)
        _run(write_deduped_stream(stream, dest, idx, ckpt))

    # batch 1 seeds corpus + index
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "pack my box with five dozen liquor jugs before the storm"),
        ],
        _DOC_SCHEMA,
    ).write.mode("append").parquet(src)
    _ingest()
    assert ParquetTable.for_path(spark, dest).read().count() == 2

    # batch 2: one near-copy of doc 1, one fresh doc
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river"),
            (11, "entirely unrelated text about distributed systems design"),
        ],
        _DOC_SCHEMA,
    ).write.mode("append").parquet(src)
    _ingest()
    landed = {
        r["doc_id"]
        for r in ParquetTable.for_path(spark, dest).read().collect()
    }
    assert landed == {1, 2, 11}  # the near-copy was screened out

    # batch 3: near-copy of the batch-2 survivor -> caught by the GROWN index
    spark.createDataFrame(
        [(20, "entirely unrelated text about distributed systems design")],
        _DOC_SCHEMA,
    ).write.mode("append").parquet(src)
    _ingest()
    landed = {
        r["doc_id"]
        for r in ParquetTable.for_path(spark, dest).read().collect()
    }
    assert landed == {1, 2, 11}

    # restart on the SAME checkpoint with no new files: a no-op — no new
    # versions on either table (exactly-once across restarts)
    dest_v = ParquetTable.for_path(spark, dest).latest_version()
    idx_v = ParquetTable.for_path(spark, idx).latest_version()
    _ingest()
    assert ParquetTable.for_path(spark, dest).latest_version() == dest_v
    assert ParquetTable.for_path(spark, idx).latest_version() == idx_v


def test_deduped_stream_recovers_from_partial_bootstrap_crash(spark, tmp_path):
    """Crash window regression: if a first-batch replay finds ONE of the
    two tables already created (crash between commits), the sink must
    recover instead of failing every restart."""
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        winnow_fingerprints_long,
    )
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        write_deduped_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    dest, idx, ckpt = (
        str(tmp_path / "dest"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river")],
        _DOC_SCHEMA,
    )
    docs.write.mode("append").parquet(src)
    # simulate the old crash state: index table exists, docs table doesn't
    ParquetTable.create(
        spark, idx, winnow_fingerprints_long(docs.limit(0))
    )
    stream = read_file_stream(spark, src, _DOC_SCHEMA)
    _run(write_deduped_stream(stream, dest, idx, ckpt))
    assert ParquetTable.for_path(spark, dest).read().count() == 1
    assert ParquetTable.for_path(spark, idx).read().count() > 0


def test_txn_sink_dedupes_identical_rerun_with_fresh_checkpoint(spark, dirs):
    """Exactly-once append sink: with txn_app set, re-processing the same
    source through a FRESH checkpoint replays the same (app, batch-id)
    sequence and every already-landed batch skips at metadata cost."""
    _events(spark, [(1, 0, 1, "click", 1.0), (2, 1, 2, "view", 2.0)]).write.mode(
        "append"
    ).parquet(dirs["src"])
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(
        write_stream_to_table(
            stream, dirs["out"], dirs["ckpt"], txn_app="ingest"
        )
    )
    assert ParquetTable.for_path(spark, dirs["out"]).read().count() == 2

    # same files, fresh checkpoint: batch 0 replays -> txn skip, no dupes
    ckpt2 = dirs["ckpt"] + "2"
    stream = read_file_stream(spark, dirs["src"], _SCHEMA)
    _run(write_stream_to_table(stream, dirs["out"], ckpt2, txn_app="ingest"))
    assert ParquetTable.for_path(spark, dirs["out"]).read().count() == 2


def test_deduped_stream_never_duplicates_preexisting_index_rows(spark, tmp_path):
    """A pre-existing data-bearing index (populated outside this
    checkpoint's txn lineage) must not get its rows doubled when the same
    documents flow through the stream — doubling would inflate every
    future n_shared/containment against them."""
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        winnow_fingerprints_long,
    )
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        write_deduped_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    dest, idx, ckpt = (
        str(tmp_path / "dest"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    doc1 = (1, "the quick brown fox jumps over the lazy dog near the river")
    docs = spark.createDataFrame([doc1], _DOC_SCHEMA)
    # legacy state: index already holds doc 1's fingerprints, docs table
    # exists, but no txn watermark for this checkpoint
    ParquetTable.create(spark, idx, winnow_fingerprints_long(docs))
    ParquetTable.create(spark, dest, docs)
    n_idx_before = ParquetTable.for_path(spark, idx).read().count()

    spark.createDataFrame(
        [doc1, (2, "a wholly different sentence about distributed engines")],
        _DOC_SCHEMA,
    ).write.mode("append").parquet(src)
    stream = read_file_stream(spark, src, _DOC_SCHEMA)
    _run(write_deduped_stream(stream, dest, idx, ckpt))

    idx_rows = ParquetTable.for_path(spark, idx).read()
    # doc 1's rows exist exactly once; doc 2's were added
    assert idx_rows.filter(F.col("doc_id") == 1).count() == n_idx_before
    assert (
        idx_rows.groupBy("doc_id", "fp").count().filter("count > 1").count()
        == 0
    )
    assert idx_rows.filter(F.col("doc_id") == 2).count() > 0
    # and the docs table holds doc 1 exactly once: the re-arrival
    # self-matched against its own index entries and was rejected
    dest_rows = ParquetTable.for_path(spark, dest).read()
    assert dest_rows.filter(F.col("doc_id") == 1).count() == 1
    assert {r["doc_id"] for r in dest_rows.collect()} == {1, 2}
