"""``CREATE/REFRESH STREAMING TABLE`` (DLT parity) — continuous
table-to-table ingestion composed from the CDF plain-table stream and
the checkpointed transactional-append sink.

Contract pinned: CREATE drains the source's existing rows; each REFRESH
drains exactly the commits since the last drain (exactly-once — a
replayed REFRESH with no new commits appends nothing); a rewrite commit
in the source RAISES (Delta's streaming-table contract: a plain stream
cannot represent a retraction).
"""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse


@pytest.fixture()
def lh(spark, tmp_path):
    return Lakehouse(spark, warehouse=str(tmp_path / "wh"))


def _rows(lh, name):
    return sorted(
        tuple(r) for r in lh.sql(f"SELECT * FROM {name}").collect()
    )


def test_create_drains_then_refresh_is_incremental(lh):
    lh.sql(
        "CREATE TABLE src AS SELECT col1 AS k, col2 AS v FROM VALUES "
        "(1, 'a'), (2, 'bb'), (3, 'ccc')"
    )
    lh.sql(
        "CREATE STREAMING TABLE st AS "
        "SELECT k, UPPER(v) AS vu FROM STREAM(src) WHERE k > 1"
    )
    assert _rows(lh, "st") == [(2, "BB"), (3, "CCC")]

    # no new commits: refresh appends nothing
    before = _rows(lh, "st")
    lh.sql("REFRESH STREAMING TABLE st")
    assert _rows(lh, "st") == before

    lh.sql("INSERT INTO src VALUES (4, 'dddd'), (0, 'zzz')")
    lh.sql("REFRESH STREAMING TABLE st")
    assert _rows(lh, "st") == [(2, "BB"), (3, "CCC"), (4, "DDDD")]

    # the target is an ordinary table: DML applies
    lh.sql("DELETE FROM st WHERE k = 2")
    assert _rows(lh, "st") == [(3, "CCC"), (4, "DDDD")]


def test_rewrite_commit_in_source_raises(lh):
    lh.sql("CREATE TABLE src2 AS SELECT col1 AS k FROM VALUES (1), (2)")
    lh.sql("CREATE STREAMING TABLE st2 AS SELECT k FROM STREAM(src2)")
    lh.sql("DELETE FROM src2 WHERE k = 1")  # retraction commit
    with pytest.raises(Exception, match="(?i)skipChangeCommits|remove|rewrit"):
        lh.sql("REFRESH STREAMING TABLE st2")


def test_refresh_non_streaming_table_raises(lh):
    lh.sql("CREATE TABLE plain AS SELECT 1 AS a")
    with pytest.raises(ValueError, match="not a streaming table"):
        lh.sql("REFRESH STREAMING TABLE plain")


def test_create_requires_stream_source(lh):
    lh.sql("CREATE TABLE src3 AS SELECT 1 AS a")
    with pytest.raises(ValueError, match="STREAM"):
        lh.sql("CREATE STREAMING TABLE bad AS SELECT a FROM src3")
