"""Dedup operator unit tests: keep_latest tiebreakers vs latest_by
(``silver/silver_rx_claims_load.py:159-179`` parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.dedup import keep_latest, latest_by


def _dupes(spark):
    ts = dt.datetime
    rows = [
        # key, received, ingested, payload
        ("k1", dt.date(2024, 1, 1), ts(2024, 1, 1, 0), "old"),
        ("k1", dt.date(2024, 1, 2), ts(2024, 1, 1, 0), "newer-received"),
        ("k1", dt.date(2024, 1, 2), ts(2024, 1, 2, 0), "latest"),
        ("k2", dt.date(2024, 1, 1), ts(2024, 1, 1, 0), "only"),
    ]
    return spark.createDataFrame(
        rows, "k string, received date, ingested timestamp, payload string"
    )


def test_keep_latest_tiebreak_order(spark):
    out = keep_latest(
        _dupes(spark),
        keys=["k"],
        order_by=[F.col("received").desc(), F.col("ingested").desc()],
    )
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {"k1": "latest", "k2": "only"}


def test_keep_latest_one_row_per_key(spark):
    df = _dupes(spark)
    out = keep_latest(df, ["k"], [F.col("ingested").desc()])
    assert out.count() == df.select("k").distinct().count()
    assert out.columns == df.columns  # helper rank column dropped


def test_latest_by_matches_keep_latest_on_unique_ts(spark):
    df = _dupes(spark)
    via_window = {
        (r["k"], r["payload"])
        for r in keep_latest(df, ["k"], [F.col("ingested").desc()]).collect()
    }
    # latest_by keys excluded from payload; columns reconstructed
    via_agg = latest_by(df, ["k"], "ingested", ["received", "ingested", "payload"])
    assert set(via_agg.columns) == {"k", "received", "ingested", "payload"}
    got = {(r["k"], r["payload"]) for r in via_agg.collect()}
    # k1 has a unique max ingested ts, k2 trivially unique -> must agree
    assert got == via_window


def test_idempotent(spark):
    df = _dupes(spark)
    once = keep_latest(df, ["k"], [F.col("ingested").desc()])
    twice = keep_latest(once, ["k"], [F.col("ingested").desc()])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_salted_matches_unsalted(spark):
    from azure_databricks_lakehouse_spark.operators.dedup import keep_latest_salted

    # hot key: one k value carries most rows
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 == 0, F.col("id").cast("string"))
        .otherwise(F.lit("HOT"))
        .alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 7 % 5000).alias("v"),
    )
    plain = keep_latest(df, ["k"], [F.col("seq").desc()])
    salted = keep_latest_salted(df, ["k"], ["seq"], salt_mod=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select(*plain.columns).collect())
    )
