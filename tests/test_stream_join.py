"""Stream-stream join with bounded state (``streaming/jobs.join_streams``).

The impressions⋈clicks shape: clicks join their impression only within
the allowed interval; a leftOuter impression with no click NULL-pads
and emits once the watermark proves no match can arrive.  Both sides
drip in as file streams so the join runs through real micro-batch
state, not a batch plan.
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.streaming.jobs import (
    join_streams,
    read_file_stream,
)

_SCHEMA_L = "k int, ts timestamp, imp string"
_SCHEMA_R = "k int, cts timestamp, click string"


def _write(spark, path, schema, rows):
    # timestamps arrive as strings; cast via a string schema then to the
    # declared one (createDataFrame refuses str -> timestamp directly)
    names = [f.split()[0] for f in schema.split(",")]
    str_schema = ", ".join(f"{n} string" for n in names)
    df = spark.createDataFrame(rows, str_schema)
    for field in schema.split(","):
        n, t = field.split()
        df = df.withColumn(n, df[n].cast(t))
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, out_name, joined):
    q = (
        joined.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {out_name}")


def test_inner_join_respects_interval(spark, tmp_path):
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    t = "2024-01-01 10:{:02d}:00"
    _write(
        spark,
        lp,
        _SCHEMA_L,
        [(1, t.format(0), "i1"), (2, t.format(0), "i2"), (3, t.format(30), "i3")],
    )
    _write(
        spark,
        rp,
        _SCHEMA_R,
        [
            (1, t.format(5), "c1"),       # within 10 min -> joins
            (2, t.format(25), "c2-late"),  # 25 min after -> dropped
            (3, t.format(29), "c3-early"),  # BEFORE the impression -> dropped
        ],
    )
    joined = join_streams(
        read_file_stream(spark, lp, _SCHEMA_L),
        read_file_stream(spark, rp, _SCHEMA_R),
        keys=["k"],
        left_ts="ts",
        right_ts="cts",
        within="10 minutes",
        watermark="20 minutes",
    )
    rows = _run(spark, "sj_inner", joined).collect()
    assert [(r.k, r.imp, r.click) for r in rows] == [(1, "i1", "c1")]


def test_left_outer_emits_null_padded_after_watermark(spark, tmp_path):
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    # separate files + maxFilesPerTrigger=1 force multiple micro-batches:
    # the watermark only advances at batch boundaries, and an unmatched
    # outer row emits in a LATER batch once the watermark passes its
    # horizon — the far-future flush rows push it there
    _write(
        spark,
        lp,
        _SCHEMA_L,
        [(1, "2024-01-01 10:00:00", "i1"), (2, "2024-01-01 10:00:00", "i2")],
    )
    _write(spark, lp, _SCHEMA_L, [(9, "2024-01-01 12:00:00", "flush")])
    _write(spark, rp, _SCHEMA_R, [(1, "2024-01-01 10:05:00", "c1")])
    _write(spark, rp, _SCHEMA_R, [(9, "2024-01-01 12:00:00", "rflush")])
    joined = join_streams(
        read_file_stream(spark, lp, _SCHEMA_L, max_files_per_trigger=1),
        read_file_stream(spark, rp, _SCHEMA_R, max_files_per_trigger=1),
        keys=["k"],
        left_ts="ts",
        right_ts="cts",
        within="10 minutes",
        watermark="20 minutes",
        how="leftOuter",
    )
    rows = {
        r.k: (r.imp, r.click)
        for r in _run(spark, "sj_outer", joined).collect()
        if r.k in (1, 2)
    }
    assert rows[1] == ("i1", "c1")
    assert rows[2] == ("i2", None)  # no click ever: NULL-padded emission


def test_colliding_columns_and_bad_how_refuse(spark, tmp_path):
    lp = str(tmp_path / "l")
    _write(spark, lp, _SCHEMA_L, [(1, "2024-01-01 00:00:00", "x")])
    left = read_file_stream(spark, lp, _SCHEMA_L)
    with pytest.raises(ValueError, match="collide"):
        join_streams(
            left, left, keys=["k"], left_ts="ts", right_ts="ts"
        )
    right = read_file_stream(spark, lp, _SCHEMA_L).withColumnRenamed(
        "imp", "imp2"
    ).withColumnRenamed("ts", "cts")
    with pytest.raises(ValueError, match="how="):
        join_streams(
            left, right, keys=["k"], left_ts="ts", right_ts="cts", how="anti"
        )
