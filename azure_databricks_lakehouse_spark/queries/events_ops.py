"""Event-time operators over the ``events`` stream table.

The reference's incremental surface is batch watermarking (ST1,
``silver/silver_rx_claims_load.py:29-63``) with streaming documented as the
evolution path (``README.md:20,63``); event-time windows are the natural
extension (SURVEY.md §2.9).  These queries implement the batch-queryable
half of that surface — the same expressions run under Structured Streaming
(``streaming/jobs.py``) with ``withWatermark`` bounding state.

The ``events.ts`` column arrives as parquet TIMESTAMP(NANOS); see
``sources/catalog.load_table`` for the nanos→micros read that keeps Spark
and DuckDB in exact agreement.

Oracle robustness: bucket/session timestamps are surfaced as **epoch
seconds** (``unix_timestamp`` / ``epoch()``), which are absolute and
session-timezone-independent — raw timestamp columns shift with the
driver session's timezone in the pandas bridge.

Scale notes: the tumbling-window rollup is one hash aggregate (window
start is a derived grouping key — no shuffle beyond the agg); the JSON
extraction is a pure projection (Spark's ``from_json`` is codegen'd, no
Python); sessionization shuffles once on ``user_id`` and re-uses that
partitioning for both window functions (lag + running sum) and the final
per-session aggregate — Catalyst plans a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.numeric import dec_sum, dec_sum_sql
from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind

_SESSION_GAP_S = 1800  # 30 min


# --- q21: tumbling-window aggregation (event-time windows, §2.9 ext) -------
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_Q21_SQL = f"""
SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {dec_sum_sql('"value"')} AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- q22: semi-structured props — from_json AND VARIANT (round-10) ---------
def q22_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-bucket rollup through BOTH semi-structured routes,
    tagged ``impl='from_json'|'variant'`` (round-10 corpus extension
    under the 50-query budget):

    - ``from_json``: schema-on-read struct extraction (codegen'd, the
      pre-VARIANT Databricks idiom), the original q22.
    - ``variant``: ``parse_json`` into Spark 4's VARIANT binary then
      ``variant_get`` path extraction — the Databricks VARIANT surface
      (GA DBR 15.3).  Both impls must agree with the oracle's
      ``json_extract_string``, which pins the two engines' JSON→int
      semantics against DuckDB's.

    Both are pure projections into one hash aggregate each — no extra
    shuffle beyond each agg's partial/final pair."""
    t = bind(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    base = (
        t["events"]
        .select(k.alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(F.lit("from_json").alias("impl"), "*")
    )
    kv = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    var = (
        t["events"]
        .select(kv.alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(F.lit("variant").alias("impl"), "*")
    )
    return base.unionByName(var)


_Q22_SQL = f"""
WITH rolled AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_bucket,
         COUNT(*) AS n_events,
         {dec_sum_sql('"value"')} AS sum_value
  FROM events
  GROUP BY 1
)
SELECT 'from_json' AS impl, * FROM rolled
UNION ALL
SELECT 'variant', * FROM rolled
"""


# --- q23: sessionization, both implementations (merged q23 + q37) ----------
_GAP_US = _SESSION_GAP_S * 1_000_000


def q23_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization BOTH ways in one tagged union — merged from the
    former q23_sessionize and q37_session_window so the corpus fits the
    driver's 50-query correctness budget (round-3 verdict item 1); both
    implementations stay oracle-verified:

    - ``impl='gaps_islands'``: lag + running-sum analytic windows (ST5
      ext) at second granularity (new session when gap > 30 min);
      session_start/session_len in epoch seconds.
    - ``impl='session_window'``: Spark's built-in session-window operator
      at microsecond granularity (a new session opens at gap >= 30 min);
      the oracle re-derives the same sessions with gaps-and-islands SQL
      in exact microseconds; session_start/session_len in epoch micros
      (len includes the trailing gap, matching ``w.end``).

    Both sides shuffle once on ``user_id`` and reuse that partitioning
    for the window functions and the per-session aggregate."""
    t = bind(spark, sf_dir, "events")

    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(order)
    new_session = F.when(gap.isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_session = t["events"].select(
        "user_id",
        "event_id",
        epoch.alias("ts_epoch"),
        F.sum(new_session).over(running).alias("session_seq"),
    )
    gaps_islands = (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_epoch").alias("session_start"),
            (F.max("ts_epoch") - F.min("ts_epoch")).alias("session_len"),
        )
        .select(
            F.lit("gaps_islands").alias("impl"),
            "user_id",
            "session_start",
            "session_len",
            "n_events",
        )
    )

    native = (
        t["events"]
        .groupBy(
            F.session_window("ts", f"{_SESSION_GAP_S} seconds").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("session_window").alias("impl"),
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            (
                F.unix_micros(F.col("w.end")) - F.unix_micros(F.col("w.start"))
            ).alias("session_len"),
            "n_events",
        )
    )
    return gaps_islands.unionByName(native)


_Q23_SQL = f"""
WITH ordered_s AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
flagged_s AS (
  SELECT user_id, event_id, ts, ts_epoch,
         CASE WHEN gap IS NULL OR gap > {_SESSION_GAP_S} THEN 1 ELSE 0 END AS new_session
  FROM ordered_s
),
sessions_s AS (
  SELECT user_id, ts_epoch,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_seq
  FROM flagged_s
),
ordered_us AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
flagged_us AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN gap_us IS NULL OR gap_us >= {_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM ordered_us
),
sessions_us AS (
  SELECT user_id, ts_us,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_seq
  FROM flagged_us
)
SELECT 'gaps_islands' AS impl,
       user_id,
       MIN(ts_epoch) AS session_start,
       MAX(ts_epoch) - MIN(ts_epoch) AS session_len,
       COUNT(*) AS n_events
FROM sessions_s
GROUP BY user_id, session_seq
UNION ALL
SELECT 'session_window' AS impl,
       user_id,
       MIN(ts_us) AS session_start,
       MAX(ts_us) + {_GAP_US} - MIN(ts_us) AS session_len,
       COUNT(*) AS n_events
FROM sessions_us
GROUP BY user_id, session_seq
"""


# --- q38: approx-distinct sketch (HLL) with an accuracy bound --------------
def q38_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches differ across engines, so the oracle checks the
    *contract*: the exact cardinalities (hash-compared) plus a boolean
    asserting Spark's approx_count_distinct landed within 10% (rsd=0.02;
    at these cardinalities the sketch is effectively exact)."""
    t = bind(spark, sf_dir, "events")
    approx_u = F.approx_count_distinct("user_id", rsd=0.02)
    exact_u = F.count_distinct("user_id")
    return t["events"].agg(
        exact_u.alias("exact_users"),
        F.count_distinct("event_type").alias("exact_types"),
        (
            F.abs(approx_u.cast("double") - exact_u.cast("double"))
            / exact_u.cast("double")
            <= 0.1
        ).alias("approx_within_10pct"),
    )


_Q38_SQL = """
SELECT COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT event_type) AS exact_types,
       TRUE AS approx_within_10pct
FROM events
"""


QUERIES: dict[str, QuerySpec] = {
    "q21_tumbling_window": QuerySpec(q21_tumbling_window, _Q21_SQL),
    "q22_props_json": QuerySpec(q22_props_json, _Q22_SQL),
    "q23_sessionize": QuerySpec(q23_sessionize, _Q23_SQL),
    "q38_approx_distinct": QuerySpec(q38_approx_distinct, _Q38_SQL),
}
