"""ANALYZE statistics as PLAN DECISIONS (round-8 verdict item 1).

Until round 9, statistics were display-only (DESCRIBE EXTENDED).  These
tests pin the two consumption paths the Databricks CBO surface implies
(reference ``README.md:64`` "optimize queries"):

* metadata-only ``count(*)``: fresh stats answer with ZERO Spark jobs;
  stale/absent stats recompute the same exact answer from parquet
  footers minus deletion-vector cardinality (still no data scan) — the
  answer is exact at every staleness state, freshness only decides
  whether any job runs;
* stats-driven broadcast-side choice in the engine's own composed joins
  (gold star dims, MERGE's touched-file probe, urlfilter): fresh stats
  bounding a side under the threshold keep/force the static broadcast,
  fresh stats proving it LARGE decline the hint, and no usable stats
  fall back to today's behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.urlfilter import filter_urls
from azure_databricks_lakehouse_spark.pipelines.gold import _fact_frame
from azure_databricks_lakehouse_spark.plans.cbo import (
    DEFAULT_BROADCAST_THRESHOLD,
    estimated_size,
    fresh_statistics,
    maybe_broadcast,
)
from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


def _docs(spark, n=40, start=0):
    return spark.range(start, start + n).selectExpr(
        "cast(id as int) as k",
        "concat('w_', cast(id % 7 as string)) as w",
        "cast(id * 1.5 as double) as x",
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _jobs_during(spark, fn, group: str):
    """Run ``fn`` under a job group and return the job ids it launched."""
    sc = spark.sparkContext
    sc.setJobGroup(group, "cbo job-count probe")
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    return out, sc.statusTracker().getJobIdsForGroup(group)


# -- metadata-only count ----------------------------------------------------


def test_count_with_fresh_stats_runs_zero_jobs(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.append(_docs(spark, 10, start=40))
    t.analyze(noscan=True)
    # the ANALYZE commit itself is metadata-only, so the stats stay
    # fresh even though latest_version advanced past as_of_version
    assert fresh_statistics(t) is not None
    n, jobs = _jobs_during(spark, t.count, "cbo-count-fresh")
    assert n == 50
    assert jobs == [], f"stats-backed count launched jobs: {jobs}"


def test_count_stale_stats_recomputes_exact(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.analyze(noscan=True)
    t.append(_docs(spark, 10, start=40))  # data commit -> stats stale
    assert fresh_statistics(t) is None
    assert t.count() == 50  # footer path, exact despite stale stats
    assert t.read().count() == 50


def test_count_without_any_stats_matches_scan(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 25))
    assert t.count() == 25


def test_count_respects_deletion_vectors(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.delete("k < 10", mode="merge-on-read")
    assert t.count() == 30
    t.analyze(noscan=True)
    n, jobs = _jobs_during(spark, t.count, "cbo-count-dv")
    assert n == 30 and jobs == []


# -- SQL COUNT(*) fast path -------------------------------------------------


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _tasks_in_group(spark, group: str) -> int:
    tr = spark.sparkContext.statusTracker()
    total = 0
    for jid in tr.getJobIdsForGroup(group):
        for sid in tr.getJobInfo(jid).stageIds:
            si = tr.getStageInfo(sid)
            if si:
                total += si.numTasks
    return total


def test_sql_count_star_matches_spark_without_scanning(spark, lake):
    lake.sql(
        "CREATE TABLE docs AS SELECT id AS k, id % 3 AS g FROM range(37)"
    )
    lake.sql("ANALYZE TABLE docs COMPUTE STATISTICS NOSCAN")
    df = lake.sql("SELECT COUNT(*) FROM docs")
    # the answer comes from stats: the returned frame is a constant
    # projection, no file scan anywhere in its plan ...
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    # ... and collecting it costs at most the 1-task local-relation
    # fetch (python's collect always registers one job), vs the 9-task
    # scan the general path runs on this table
    out, _ = _jobs_during(spark, df.collect, "cbo-sql-count")
    assert [r[0] for r in out] == [37]
    assert _tasks_in_group(spark, "cbo-sql-count") <= 1
    # column-name parity with what spark.sql would have returned
    spark.range(5).createOrReplaceTempView("__cbo_name_probe")
    want = spark.sql("SELECT COUNT(*) FROM __cbo_name_probe").columns
    assert lake.sql("SELECT COUNT(*) FROM docs").columns == want
    assert lake.sql("SELECT COUNT(1) AS n FROM docs").columns == ["n"]


def test_sql_count_star_qualified_forms_not_intercepted(lake):
    lake.sql(
        "CREATE TABLE ev AS SELECT id AS k, id % 3 AS g FROM range(30)"
    )
    assert lake.sql("SELECT COUNT(*) FROM ev WHERE g = 0").first()[0] == 10
    assert (
        lake.sql("SELECT g, COUNT(*) AS n FROM ev GROUP BY g ORDER BY g")
        .count()
        == 3
    )
    # the unqualified form agrees with the scan it replaces
    assert lake.sql("SELECT COUNT(*) FROM ev").first()[0] == 30


def test_sql_count_star_honors_cache_pin(lake):
    lake.sql("CREATE TABLE pin AS SELECT id FROM range(20)")
    lake.sql("CACHE TABLE pin")
    lake.table("pin").append(
        lake.spark.range(20, 25).selectExpr("id")
    )
    # D9 semantics: the pinned snapshot answers — the fast path must
    # NOT shortcut past the pin to the newer manifest
    assert lake.sql("SELECT COUNT(*) FROM pin").first()[0] == 20
    lake.sql("UNCACHE TABLE pin")
    assert lake.sql("SELECT COUNT(*) FROM pin").first()[0] == 25


def test_sql_count_star_sees_dml(lake):
    lake.sql("CREATE TABLE d AS SELECT id AS k FROM range(40)")
    lake.sql("ANALYZE TABLE d COMPUTE STATISTICS NOSCAN")
    lake.sql("DELETE FROM d WHERE k >= 30")
    # stats went stale with the DELETE; the answer must not
    assert lake.sql("SELECT COUNT(*) FROM d").first()[0] == 30


# -- broadcast-side choice --------------------------------------------------

_BIG = {
    "as_of_version": 0,
    "num_rows": 1_000_000_000,
    "size_bytes": 1 << 40,
}
_SMALL = {"as_of_version": 0, "num_rows": 1_000, "size_bytes": 64 << 10}


def test_maybe_broadcast_decisions(spark):
    df = spark.range(10).toDF("k")
    # no stats -> caller default
    assert maybe_broadcast(df, None, default=False) is df
    assert maybe_broadcast(df, None, default=True) is not df
    # fresh-small -> hint even when the default declines
    assert maybe_broadcast(df, _SMALL, default=False) is not df
    # fresh-large -> DECLINE even when the default broadcasts (identity
    # return, so the decision is assertable without plan archaeology)
    assert maybe_broadcast(df, _BIG, default=True) is df


def test_estimated_size_prefers_column_projection():
    stats = {
        "as_of_version": 3,
        "num_rows": 1000,
        "size_bytes": 10 << 30,
        "columns": {
            "k": {"min": 0, "max": 9, "null_count": 0,
                  "distinct_count_approx": 10},
            "w": {"min": "a", "max": "z", "null_count": 0,
                  "distinct_count_approx": 7, "avg_len": 4.0,
                  "max_len": 8},
        },
    }
    proj = estimated_size(stats, ["k", "w"])
    # 1000 rows x (8 fixed + 4 avg_len + 16 overhead) — far below the
    # whole-table fallback
    assert proj == 1000 * (8 + 20)
    assert estimated_size(stats) == 10 << 30
    # a column without stats can't be bounded -> whole-table fallback
    assert estimated_size(stats, ["k", "x"]) == 10 << 30
    assert estimated_size(None, ["k"]) is None


def _hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )


def test_fact_frame_declines_broadcast_for_stats_large_dim(spark):
    claims = spark.createDataFrame(
        [(1, 1, "M1", "P1", "2024-01-02", "2024-01-03", "J3490", "E11.9",
          100.0, 80.0, 70.0, "11", "RX")],
        "claim_id int, claim_line_number int, member_id string, "
        "provider_id string, service_date string, received_date string, "
        "procedure_code string, diagnosis_code string, "
        "billed_amount double, allowed_amount double, paid_amount double, "
        "place_of_service string, claim_type string",
    ).withColumn("service_date", F.to_date("service_date")).withColumn(
        "received_date", F.to_date("received_date")
    )
    member = spark.createDataFrame(
        [("M1", 1)], "member_key string, member_sk long"
    )
    provider = spark.createDataFrame(
        [("P1", 1)], "provider_key string, provider_sk long"
    )
    date_dim = spark.createDataFrame(
        [("2024-01-02", 20240102), ("2024-01-03", 20240103)],
        "date_value string, date_key int",
    ).withColumn("date_value", F.to_date("date_value"))

    baseline = _fact_frame(claims, member, provider, date_dim)
    assert _hint_count(baseline) == 4  # member, provider, 2 date roles

    declined = _fact_frame(
        claims, member, provider, date_dim,
        dim_stats={"member": _BIG},
    )
    # the stats-large member dim loses its hint; the others keep theirs
    assert _hint_count(declined) == 3
    # and the decision changes the plan only, not the rows
    assert sorted(map(tuple, declined.drop("gold_created_timestamp")
                      .collect())) == sorted(
        map(tuple, baseline.drop("gold_created_timestamp").collect())
    )


def test_merge_probe_flip_with_fresh_key_stats(spark, root):
    """A MERGE against a target whose FRESH column stats bound the key
    projection under the broadcast threshold takes the flipped probe
    (broadcast target keys, source never shuffles) — and produces the
    same commit a statless merge would."""
    t = ParquetTable.create(spark, root, _docs(spark, 30))
    t.analyze(columns=["k"])
    s = fresh_statistics(t)
    assert s is not None
    assert estimated_size(s, ["k"]) <= DEFAULT_BROADCAST_THRESHOLD
    src = spark.createDataFrame(
        [(5, "upd", 99.0), (100, "new", 1.0)], "k int, w string, x double"
    )
    t.merge(src, on=["k"])
    rows = {r["k"]: r["w"] for r in t.read().collect()}
    assert rows[5] == "upd" and rows[100] == "new" and len(rows) == 31
    # replay idempotence survives the flipped probe
    t.merge(src, on=["k"])
    assert t.read().count() == 31


def test_merge_probe_declines_flip_when_stats_stale(spark, root):
    t = ParquetTable.create(spark, root, _docs(spark, 30))
    t.analyze(columns=["k"])
    t.append(_docs(spark, 5, start=30))  # stats now stale
    assert fresh_statistics(t) is None
    src = spark.createDataFrame([(2, "u", 0.0)], "k int, w string, x double")
    t.merge(src, on=["k"])  # AQE path — still correct
    assert t.read().filter("k = 2").first()["w"] == "u"
    assert t.read().count() == 35


def test_filter_urls_blocklist_stats_force_static_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "https://ads.evil.com/x"), (2, "https://good.org/y")],
        "doc_id int, url string",
    )
    bl = spark.createDataFrame([("evil.com",)], "domain string")
    plain = filter_urls(docs, blocklist=bl)
    hinted = filter_urls(docs, blocklist=bl, blocklist_stats=_SMALL)
    assert _hint_count(plain.removed) == 0  # default: AQE decides
    assert _hint_count(hinted.removed) == 1  # fresh-small: static hint
    for res in (plain, hinted):
        assert [r["doc_id"] for r in res.kept.collect()] == [2]
        assert {r["reason"] for r in res.removed.collect()} == {"blocklist"}


def test_describe_extended_staleness_flag_still_works(lake):
    lake.sql("CREATE TABLE st AS SELECT id FROM range(10)")
    lake.sql("ANALYZE TABLE st COMPUTE STATISTICS NOSCAN")
    rows = {
        r["col_name"]: r["comment"]
        for r in lake.sql("DESCRIBE EXTENDED st").collect()
    }
    assert rows["Num Rows"] == ""
    lake.sql("INSERT INTO st SELECT id FROM range(10, 12)")
    rows = {
        r["col_name"]: r["comment"]
        for r in lake.sql("DESCRIBE EXTENDED st").collect()
    }
    assert rows["Num Rows"] == "stale"


def test_sql_min_max_from_fresh_column_stats(spark, lake):
    """SELECT MIN/MAX/COUNT(*) over an unfiltered table answers from
    fresh ANALYZE column stats with no file scan in the plan; stale
    stats fall through to the real scan (same answer, real jobs);
    string/date columns round-trip through the stored stat forms."""
    lake.sql(
        "CREATE TABLE mm AS SELECT id AS k, "
        "CONCAT('v_', CAST(id AS STRING)) AS s, "
        "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS d "
        "FROM range(50)"
    )
    lake.sql("ANALYZE TABLE mm COMPUTE STATISTICS FOR ALL COLUMNS")
    df = lake.sql(
        "SELECT COUNT(*) AS n, MIN(k) AS lo, MAX(k) AS hi, "
        "MIN(s) AS slo, MAX(d) AS dhi FROM mm"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    row = df.collect()[0]
    assert (row["n"], row["lo"], row["hi"]) == (50, 0, 49)
    assert row["slo"] == "v_0"
    assert str(row["dhi"]) == "2024-02-19"
    # column-name parity with what spark.sql would return, unaliased
    spark.range(3).createOrReplaceTempView("__mm_probe")
    want = spark.sql("SELECT MIN(id), MAX(id) FROM __mm_probe").columns
    got = lake.sql("SELECT MIN(k), MAX(k) FROM mm").columns
    assert got == ["min(k)", "max(k)"] and want == ["min(id)", "max(id)"]
    # types survive the constant projection (not stringly-typed)
    assert dict(df.dtypes)["dhi"] == "date" and dict(df.dtypes)["hi"] in (
        "bigint",
        "long",
    )
    # stale stats: same answers via the real scan, incl. the new row
    lake.sql("INSERT INTO mm VALUES (99, 'zzz', DATE'2030-01-01')")
    row = lake.sql(
        "SELECT COUNT(*) AS n, MAX(k) AS hi, MAX(d) AS dhi FROM mm"
    ).collect()[0]
    assert (row["n"], row["hi"], str(row["dhi"])) == (51, 99, "2030-01-01")
    # DV-aware: the stats were computed over the post-DELETE snapshot
    lake.sql("DELETE FROM mm WHERE k = 99")
    lake.sql("ANALYZE TABLE mm COMPUTE STATISTICS FOR COLUMNS k")
    df = lake.sql("SELECT MAX(k) AS hi FROM mm")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert df.collect()[0]["hi"] == 49


def test_sql_min_max_qualified_forms_not_intercepted(lake):
    lake.sql("CREATE TABLE mq AS SELECT id AS k, id % 3 AS g FROM range(30)")
    lake.sql("ANALYZE TABLE mq COMPUTE STATISTICS FOR ALL COLUMNS")
    # WHERE, GROUP BY, expressions, COUNT(col) all run the general path
    assert lake.sql("SELECT MAX(k) FROM mq WHERE g = 0").first()[0] == 27
    assert lake.sql("SELECT g, MAX(k) AS m FROM mq GROUP BY g").count() == 3
    assert lake.sql("SELECT MAX(k + 1) FROM mq").first()[0] == 30
    assert lake.sql("SELECT COUNT(g) FROM mq").first()[0] == 30
    # AVG mixed in: the whole statement falls through, answers agree
    row = lake.sql("SELECT MAX(k) AS m, AVG(k) AS a FROM mq").collect()[0]
    assert (row["m"], row["a"]) == (29, 14.5)


def test_sql_join_broadcasts_stats_small_dim(spark, lake):
    """A registered view carries a broadcast hint iff FRESH stats bound
    the table under the threshold — with Spark's size-estimate
    broadcasting disabled, only the hint can produce a BHJ, so the
    plan shape IS the decision."""
    lake.sql("CREATE TABLE facts AS SELECT id AS k, id * 2 AS v FROM range(5000)")
    lake.sql("CREATE TABLE dim AS SELECT id AS k, CONCAT('d', CAST(id AS STRING)) AS name FROM range(20)")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = "SELECT f.k, d.name FROM facts f JOIN dim d ON f.k = d.k"
        plan_plain = (
            lake.sql(q)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan_plain  # no stats: no hint
        lake.sql("ANALYZE TABLE dim COMPUTE STATISTICS NOSCAN")
        plan_hinted = (
            lake.sql(q)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan_hinted  # fresh-small: hint
        # rows are the decision-independent part
        assert lake.sql(q).count() == 20
        # stats gone stale -> hint withdrawn on the next statement
        lake.sql("INSERT INTO dim VALUES (100, 'dX')")
        plan_stale = (
            lake.sql(q)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan_stale
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sql_min_max_literal_rendering_roundtrips(spark, lake):
    """Adversarial stat values (quotes, backslashes, unicode, newlines)
    must round-trip through the constant-projection literal renderer
    bit-exactly — compared against the real scan's answer."""
    values = [
        "it's",
        'she said "hi"',
        "back\\slash",
        "tab\there",
        "new\nline",
        "ünïcodé ✓",
        "'; DROP TABLE x; --",
        "",
    ]
    rows = ", ".join(
        f"({i}, '{v.replace(chr(92), chr(92) * 2).replace(chr(39), chr(92) + chr(39))}')"
        for i, v in enumerate(values)
    )
    lake.sql(f"CREATE TABLE lit AS SELECT col1 AS k, col2 AS s FROM VALUES {rows}")
    want = spark.sql(
        "SELECT MIN(col2), MAX(col2) FROM "
        f"VALUES {rows}"
    ).collect()[0]
    lake.sql("ANALYZE TABLE lit COMPUTE STATISTICS FOR COLUMNS s")
    df = lake.sql("SELECT MIN(s) AS lo, MAX(s) AS hi FROM lit")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    got = df.collect()[0]
    assert (got["lo"], got["hi"]) == (want[0], want[1])


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_hyp_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ints=st.lists(st.integers(-(2**31), 2**31 - 1) | st.none(), min_size=1, max_size=8),
    strs=st.lists(_hyp_text | st.none(), min_size=1, max_size=8),
    dbls=st.lists(
        st.floats(allow_nan=False, allow_infinity=True, width=64) | st.none(),
        min_size=1,
        max_size=8,
    ),
)
def test_metadata_agg_matches_scan_hypothesis(spark, tmp_path_factory, ints, strs, dbls):
    """Property sweep over the metadata MIN/MAX/COUNT fast path: random
    int/string/double columns (NULLs, unicode, ±inf) must answer
    identically through the stats-backed constant projection and the
    real scan.  NaN is excluded by construction — the fast path falls
    through for it by design."""
    n = max(len(ints), len(strs), len(dbls))
    pad = lambda xs: (xs * n)[:n]  # noqa: E731
    rows = list(zip(pad(ints), pad(strs), pad(dbls)))
    base = tmp_path_factory.mktemp("mmhyp")
    df = spark.createDataFrame(rows, "i int, s string, d double")
    ParquetTable.create(spark, str(base / "t"), df)
    lake = Lakehouse(spark)
    lake.register("hyp", str(base / "t"))
    lake.sql("ANALYZE TABLE hyp COMPUTE STATISTICS FOR ALL COLUMNS")
    fast = lake.sql(
        "SELECT COUNT(*) AS n, MIN(i) AS i0, MAX(i) AS i1, "
        "MIN(s) AS s0, MAX(s) AS s1, MIN(d) AS d0, MAX(d) AS d1 FROM hyp"
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    df.createOrReplaceTempView("hyp_ref")
    want = spark.sql(
        "SELECT COUNT(*) AS n, MIN(i) AS i0, MAX(i) AS i1, "
        "MIN(s) AS s0, MAX(s) AS s1, MIN(d) AS d0, MAX(d) AS d1 "
        "FROM hyp_ref"
    ).collect()[0]
    got = fast.collect()[0]
    assert tuple(got) == tuple(want), rows


def test_sql_count_star_time_travel_metadata_only(spark, lake):
    """COUNT(*) ... VERSION AS OF answers from that version's footers
    minus its DV cardinality — exact, no data scan; historical MIN/MAX
    still runs the real time-travel scan (same answers)."""
    lake.sql("CREATE TABLE tt AS SELECT id AS k FROM range(30)")
    lake.sql("DELETE FROM tt WHERE k >= 20")  # v1: 20 rows
    lake.sql("INSERT INTO tt SELECT id FROM range(100, 105)")  # v2: 25
    for ver, want in ((0, 30), (1, 20), (2, 25)):
        df = lake.sql(f"SELECT COUNT(*) AS n FROM tt VERSION AS OF {ver}")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FileScan" not in plan and "Scan parquet" not in plan
        assert df.collect()[0]["n"] == want
    # MIN/MAX with AS OF: real scan, correct historical answer
    row = lake.sql("SELECT MAX(k) AS m FROM tt VERSION AS OF 1").collect()[0]
    assert row["m"] == 19


def test_sql_count_star_timestamp_as_of_metadata_only(spark, lake):
    lake.sql("CREATE TABLE tts AS SELECT id FROM range(10)")
    from datetime import datetime, timezone

    lake.sql("INSERT INTO tts SELECT id FROM range(10, 15)")
    # midpoint between the two commits: safely >= v0, < v1 (isoformat
    # truncation must not round below v0's own instant)
    hist = {
        r["version"]: float(r["timestamp"])
        for r in lake.sql("DESCRIBE HISTORY tts").collect()
    }
    ts = datetime.fromtimestamp(
        (hist[0] + hist[1]) / 2, tz=timezone.utc
    ).isoformat()
    df = lake.sql(f"SELECT COUNT(*) AS n FROM tts TIMESTAMP AS OF '{ts}'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    assert df.collect()[0]["n"] == 10
    assert lake.sql("SELECT COUNT(*) FROM tts").first()[0] == 15


# -- filtered metadata aggregates (round-9 verdict item 3) -------------------


def _no_scan(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "FileScan" not in plan and "Scan parquet" not in plan


def test_sql_filtered_count_partition_predicate_metadata_only(spark, lake):
    """COUNT(*) under a partition-only WHERE answers from the pruned
    file set's footer rows (OptimizeMetadataOnlyQuery parity): no data
    file in the plan, answers identical to the real scan, DV-aware."""
    lake.sql(
        "CREATE TABLE fpt PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 4 AS INT) AS p FROM range(40)"
    )
    for where, want in (
        ("p = 1", 10),
        ("p IN (1, 2)", 20),
        ("p BETWEEN 2 AND 9", 20),
        ("p = 1 OR p = 3", 20),
        ("CAST(p AS STRING) = '3'", 10),
        ("p IS NOT NULL", 40),
        ("p = 99", 0),
    ):
        df = lake.sql(f"SELECT COUNT(*) AS n FROM fpt WHERE {where}")
        assert _no_scan(df), where
        assert df.collect()[0]["n"] == want, where
    # DV-masked rows leave the filtered count (merge-on-read delete)
    lake.sql("DELETE FROM fpt WHERE k = 5")
    df = lake.sql("SELECT COUNT(*) AS n FROM fpt WHERE p = 1")
    assert _no_scan(df) and df.collect()[0]["n"] == 9
    # a non-partition column in the WHERE falls through (same answer)
    assert (
        lake.sql("SELECT COUNT(*) AS n FROM fpt WHERE k < 10").first()["n"]
        == 9
    )
    # non-deterministic predicates never take the per-file shortcut
    assert (
        lake.sql(
            "SELECT COUNT(*) AS n FROM fpt WHERE rand() < 2.0"
        ).first()["n"]
        == 39
    )


def test_sql_filtered_minmax_partition_col_metadata_only(spark, lake):
    lake.sql(
        "CREATE TABLE fmm PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 5 AS INT) AS p FROM range(50)"
    )
    df = lake.sql(
        "SELECT MIN(p) AS lo, MAX(p) AS hi, COUNT(*) AS n "
        "FROM fmm WHERE p >= 2"
    )
    assert _no_scan(df)
    assert tuple(df.collect()[0]) == (2, 4, 30)
    # MIN/MAX of a NON-partition column under a filter: real scan
    row = lake.sql("SELECT MAX(k) AS m FROM fmm WHERE p = 0").collect()[0]
    assert row["m"] == 45
    # a fully-DV-masked partition must not contribute its value
    lake.sql("DELETE FROM fmm WHERE p = 4")
    df = lake.sql("SELECT MAX(p) AS hi FROM fmm WHERE p >= 0")
    assert _no_scan(df) and df.collect()[0]["hi"] == 3


def test_sql_filtered_agg_version_as_of(spark, lake):
    lake.sql(
        "CREATE TABLE fav PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(20)"
    )
    lake.sql("DELETE FROM fav WHERE p = 1")  # v1
    df0 = lake.sql("SELECT COUNT(*) AS n FROM fav VERSION AS OF 0 WHERE p = 1")
    df1 = lake.sql("SELECT COUNT(*) AS n FROM fav VERSION AS OF 1 WHERE p = 1")
    assert _no_scan(df0) and _no_scan(df1)
    assert df0.collect()[0]["n"] == 10 and df1.collect()[0]["n"] == 0


_filter_pool = [
    "p = 0",
    "p <> 1",
    "p IN (0, 2)",
    "p < 2",
    "p >= 1 AND p <= 2",
    "p IS NULL",
    "p IS NOT NULL",
    "NOT (p = 2)",
    "p % 2 = 0",
]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(
        st.integers(0, 3) | st.none(), min_size=1, max_size=12
    ),
    where=st.sampled_from(_filter_pool),
    dml=st.none() | st.integers(0, 3),
)
def test_filtered_metadata_agg_matches_scan_hypothesis(
    spark, tmp_path_factory, parts, where, dml
):
    """Partition-filtered COUNT/MIN/MAX through the metadata frame vs
    the real scan over random partition layouts (NULL partitions, DV
    deletes) — byte-identical answers, zero data files in the plan."""
    base = tmp_path_factory.mktemp("fhyp")
    rows = [(i, p) for i, p in enumerate(parts)]
    df = spark.createDataFrame(rows, "k int, p int")
    ParquetTable.create(
        spark, str(base / "t"), df, partition_by=["p"]
    )
    lake = Lakehouse(spark)
    lake.register("fhyp", str(base / "t"))
    if dml is not None:
        lake.sql(f"DELETE FROM fhyp WHERE k % 4 = {dml}")
    q = f"SELECT COUNT(*) AS n, MIN(p) AS lo, MAX(p) AS hi FROM fhyp WHERE {where}"
    fast = lake.sql(q)
    assert _no_scan(fast), (where, parts, dml)
    lake.table("fhyp").read().createOrReplaceTempView("fhyp_ref")
    want = spark.sql(
        "SELECT COUNT(*) AS n, MIN(p) AS lo, MAX(p) AS hi "
        f"FROM fhyp_ref WHERE {where}"
    ).collect()[0]
    assert tuple(fast.collect()[0]) == tuple(want), (where, parts, dml)


# -- historical MIN/MAX from versioned stats (round-9 verdict item 4) --------


def test_sql_min_max_version_as_of_from_versioned_stats(spark, lake):
    """MIN/MAX ... VERSION AS OF v answers zero-scan iff v's stats were
    fresh AT v — later commits never invalidate a historical answer,
    earlier-than-ANALYZE versions fall through to the time-travel
    scan."""
    lake.sql("CREATE TABLE hm AS SELECT id AS k FROM range(30)")  # v0
    lake.sql("ANALYZE TABLE hm COMPUTE STATISTICS FOR ALL COLUMNS")  # v1
    lake.sql("INSERT INTO hm VALUES (999)")  # v2: stats now stale
    # v1 = the analyzed snapshot: zero-scan, the historical answer
    df = lake.sql("SELECT MIN(k) AS lo, MAX(k) AS hi FROM hm VERSION AS OF 1")
    assert _no_scan(df)
    assert tuple(df.collect()[0]) == (0, 29)
    # current version: stats stale -> real scan, sees the new row
    assert lake.sql("SELECT MAX(k) AS hi FROM hm").first()["hi"] == 999
    # v0 predates the ANALYZE -> its own tail has a data commit? no —
    # v0's manifest has NO stats prop at all -> real time-travel scan
    assert (
        lake.sql("SELECT MAX(k) AS hi FROM hm VERSION AS OF 0").first()["hi"]
        == 29
    )
    # COUNT at any version stays metadata-exact alongside
    df = lake.sql("SELECT COUNT(*) AS n, MAX(k) AS hi FROM hm VERSION AS OF 1")
    assert _no_scan(df) and tuple(df.collect()[0]) == (30, 29)


def test_sql_min_max_escaped_string_literals_conf(spark, lake):
    """Backslash-carrying stats must round-trip under BOTH parser
    modes (spark.sql.parser.escapedStringLiterals true/false)."""
    lake.sql(
        "CREATE TABLE esc AS SELECT col1 AS k, col2 AS s FROM "
        "VALUES (0, 'back\\\\slash'), (1, 'plain')"
    )
    want = sorted(r["s"] for r in lake.sql("SELECT s FROM esc").collect())
    assert want == ["back\\slash", "plain"]
    lake.sql("ANALYZE TABLE esc COMPUTE STATISTICS FOR COLUMNS s")
    old = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    try:
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.parser.escapedStringLiterals", mode)
            df = lake.sql("SELECT MIN(s) AS lo, MAX(s) AS hi FROM esc")
            assert _no_scan(df), mode
            got = df.collect()[0]
            assert (got["lo"], got["hi"]) == ("back\\slash", "plain"), mode
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", old)


def test_merge_probe_estimate_includes_path_width(spark, root, monkeypatch):
    """A1 (round-9 advice): the probe's broadcast frame is (keys,
    __rel) — the per-row file-path STRING must be in the size estimate.
    With a threshold sitting between the keys-only estimate and the
    path-inclusive one, the flip must be DECLINED (no F.broadcast in
    the touched-file scan); the merge itself stays correct."""
    import azure_databricks_lakehouse_spark.sources.tables as tables_mod
    from azure_databricks_lakehouse_spark.plans import cbo as cbo_mod

    t = ParquetTable.create(spark, root, _docs(spark, 30))
    t.analyze(columns=["k"])
    s = fresh_statistics(t)
    keys_only = estimated_size(s, ["k"])
    m = t._manifest()
    avg_path = sum(len(f) for f in m["files"]) / len(m["files"])
    assert avg_path > 8, "paths are wider than the bigint key"
    # keys fit, keys+paths don't
    mid = int(keys_only + s["num_rows"] * avg_path / 2)
    monkeypatch.setattr(cbo_mod, "DEFAULT_BROADCAST_THRESHOLD", mid)
    calls: list[int] = []
    orig = tables_mod.F.broadcast
    monkeypatch.setattr(
        tables_mod.F, "broadcast", lambda df: (calls.append(1), orig(df))[1]
    )
    src = spark.createDataFrame(
        [(5, "upd", 99.0)], "k int, w string, x double"
    )
    t.merge(src, on=["k"])
    assert calls == [], "path-blind estimate would have broadcast"
    assert t.read().filter("k = 5").first()["w"] == "upd"
    # generous threshold: the flip fires (the estimate, not the probe,
    # was the gate)
    monkeypatch.setattr(
        cbo_mod,
        "DEFAULT_BROADCAST_THRESHOLD",
        int(keys_only + s["num_rows"] * (avg_path + 64) * 4),
    )
    t.analyze(columns=["k"])
    t.merge(src, on=["k"])
    assert calls, "flip should fire once paths fit the threshold"


def test_exact_rows_reads_sidecar_not_footers(spark, root, monkeypatch):
    """Round-10: per-file row counts ride the stats sidecar (written as
    the __nrows pseudo-range), so metadata counts and the partition
    file frame never re-open O(files) parquet footers.  Proof: with
    pyarrow's footer reader poisoned, the count still answers."""
    import pyarrow.parquet as pq

    t = ParquetTable.create(spark, root, _docs(spark, 40))
    t.append(_docs(spark, 10, start=40))
    t.delete("k = 3", mode="merge-on-read")  # DV subtraction still applies
    t2 = ParquetTable.create(
        spark,
        root + "_p",
        _docs(spark, 20).withColumn("p", F.col("k") % 2),
        partition_by=["p"],
    )

    def boom(*a, **k):
        raise AssertionError("footer opened despite sidecar row counts")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    assert t.count() == 49
    # the filtered metadata frame shares the same path
    frame = t2.partition_file_frame()
    assert frame.agg(F.sum("__rows")).first()[0] == 20


def test_row_counts_footer_fallback_for_legacy_sidecars(
    spark, root, monkeypatch
):
    """Tables written before the __nrows sidecar entry existed fall
    back to per-file footer opens — same answer, just the old cost."""
    t = ParquetTable.create(spark, root, _docs(spark, 25))
    orig = ParquetTable._stats
    monkeypatch.setattr(
        ParquetTable,
        "_stats",
        lambda self, m: {
            f: {c: r for c, r in cols.items() if c != "__nrows"}
            for f, cols in orig(self, m).items()
        },
    )
    assert t.count() == 25
