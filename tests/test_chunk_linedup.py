"""Sliding-window chunking + corpus-wide duplicate-line removal: the
two text-prep stages between cleaning and dedup/embedding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.chunking import (
    chunk_documents,
)
from azure_databricks_lakehouse_spark.operators.linedup import (
    remove_duplicate_lines,
    repeated_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- chunking ---------------------------------------------------------------


def test_chunks_cover_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=8, stride=4
    ).collect()
    by_id = {r["chunk_id"]: r for r in out}
    assert len(by_id) == 2, "start=8 window adds nothing past chunk@4"
    assert by_id[0]["start_token"] == 0 and by_id[0]["n_chunk_tokens"] == 8
    assert by_id[1]["start_token"] == 4 and by_id[1]["n_chunk_tokens"] == 6
    assert by_id[0]["chunk_text"].split() == [f"w{i}" for i in range(8)]
    assert by_id[1]["chunk_text"].split() == [f"w{i}" for i in range(4, 10)]
    # overlap region appears in both chunks
    assert set(by_id[0]["chunk_text"].split()) & set(
        by_id[1]["chunk_text"].split()
    ) == {f"w{i}" for i in range(4, 8)}


def test_chunk_reconstruction_no_overlap(spark):
    """stride == chunk_tokens: chunks partition the token stream exactly."""
    text = " ".join(f"t{i}" for i in range(23))
    out = sorted(
        chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=5
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["n_chunk_tokens"] for r in out] == [5, 5, 5, 5, 3]
    assert " ".join(r["chunk_text"] for r in out) == text


def test_chunk_edge_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "only three tokens"), (2, ""), (3, "   ")]),
        chunk_tokens=512,
    ).collect()
    assert len(out) == 1, "short doc -> one chunk; empty docs -> none"
    assert out[0]["doc_id"] == 1 and out[0]["n_chunk_tokens"] == 3


def test_chunking_is_shuffle_free(spark):
    plan = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=2, stride=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "chunking must be a pure projection"


def test_chunk_param_validation(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=4, stride=5)


# --- duplicate-line removal -------------------------------------------------

_FOOTER = "subscribe to our newsletter for updates"
_NAV = "home | products | about us | contact"


def _web_corpus(spark):
    rows = [
        (i, f"unique content number {i} with real words\n{_FOOTER}\n{_NAV}")
        for i in range(6)
    ] + [(100, "a fully unique document\nwith two original lines")]
    return _docs(spark, rows)


def test_repeated_lines_finds_boilerplate(spark):
    found = {
        r["n_occurrences"]
        for r in repeated_lines(_web_corpus(spark), min_count=3).collect()
    }
    assert found == {6}, "exactly the footer and nav lines, 6 docs each"


def test_remove_duplicate_lines_strips_boilerplate_only(spark):
    out = remove_duplicate_lines(_web_corpus(spark), min_count=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i in range(6):
        assert rows[i]["text"] == f"unique content number {i} with real words"
        assert rows[i]["n_lines_removed"] == 2
    # untouched document passes through byte-identical
    assert rows[100]["text"] == "a fully unique document\nwith two original lines"
    assert rows[100]["n_lines_removed"] == 0


def test_short_repeated_lines_survive(spark):
    """Lines under min_line_chars repeat legitimately ('Yes.', '}') and
    must never be stripped."""
    rows = [(i, f"body text of doc {i} goes here\nYes.") for i in range(5)]
    out = remove_duplicate_lines(
        _docs(spark, rows), min_count=2, min_line_chars=10
    )
    assert all("Yes." in r["text"] for r in out.collect())


def test_line_order_preserved_and_normalized_matching(spark):
    """Matching is case/whitespace-insensitive; reassembly preserves the
    original line order and content."""
    rows = [
        (1, "first original line here\nSHARED   Boilerplate Line\nlast original line here"),
        (2, "other doc body line one\nshared boilerplate line\nother doc body line two"),
    ]
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(
        _docs(spark, rows), min_count=2
    ).collect()}
    assert out[1] == "first original line here\nlast original line here"
    assert out[2] == "other doc body line one\nother doc body line two"


def test_fully_boilerplate_doc_is_dropped(spark):
    rows = [(1, _FOOTER), (2, _FOOTER), (3, f"real content lives here\n{_FOOTER}")]
    out = remove_duplicate_lines(_docs(spark, rows), min_count=2)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {3}, "docs reduced to nothing are dropped"
    assert got[3]["text"] == "real content lives here"


def test_linedup_plan_no_cartesian(spark):
    plan = remove_duplicate_lines(
        _web_corpus(spark), min_count=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
