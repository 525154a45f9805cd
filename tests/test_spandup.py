"""Exact repeated-SPAN removal (ExactSubstr-style): repeated token
spans are removed exactly — covering the shared passage and nothing
else — across line and document boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.spandup import (
    remove_repeated_spans,
    repeated_span_windows,
)

_SHARED = " ".join(f"quote{i}" for i in range(12))  # 12-token passage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_shared_passage_removed_exactly(spark):
    """A passage >= span_tokens shared by two documents is removed from
    both, with the boundary tokens on each side untouched."""
    a_pre, a_post = _uniq("a", 6), _uniq("b", 6)
    c_pre, c_post = _uniq("c", 5), _uniq("d", 7)
    docs = _docs(
        spark,
        [
            (1, f"{a_pre} {_SHARED} {a_post}"),
            (2, f"{c_pre} {_SHARED} {c_post}"),
            (3, _uniq("e", 20)),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(docs, span_tokens=8).collect()
    }
    assert out[1]["text"] == f"{a_pre} {a_post}"
    assert out[2]["text"] == f"{c_pre} {c_post}"
    assert out[1]["n_tokens_removed"] == 12
    assert out[1]["n_spans_removed"] == 1
    # untouched doc passes through re-joined, nothing removed
    assert out[3]["text"] == _uniq("e", 20)
    assert out[3]["n_tokens_removed"] == 0
    assert out[3]["n_spans_removed"] == 0


def test_within_document_repetition_counts(spark):
    """ExactSubstr counts within-document occurrences too: a document
    that repeats its own passage has both occurrences removed."""
    filler = _uniq("f", 9)
    docs = _docs(spark, [(1, f"{_SHARED} {filler} {_SHARED}")])
    out = remove_repeated_spans(docs, span_tokens=8).collect()[0]
    assert out["text"] == filler
    assert out["n_tokens_removed"] == 24
    assert out["n_spans_removed"] == 2


def test_disjoint_spans_stay_separate_regions(spark):
    """Two repeated passages separated by unique text remove as two
    maximal regions, not one."""
    s2 = " ".join(f"other{i}" for i in range(10))
    mid = _uniq("m", 8)
    docs = _docs(
        spark,
        [
            (1, f"{_SHARED} {mid} {s2}"),
            (2, f"{_uniq('x', 4)} {_SHARED} {_uniq('y', 4)}"),
            (3, f"{_uniq('z', 4)} {s2} {_uniq('w', 4)}"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(docs, span_tokens=8).collect()
    }
    assert out[1]["text"] == mid
    assert out[1]["n_spans_removed"] == 2
    assert out[1]["n_tokens_removed"] == 22


def test_fully_repeated_doc_survives_empty(spark):
    """A document that is ONE big repeated span keeps its row with empty
    text — dropping is the caller's policy via the audit columns."""
    docs = _docs(spark, [(1, _SHARED), (2, _SHARED)])
    out = {r["doc_id"]: r for r in remove_repeated_spans(docs, span_tokens=8).collect()}
    assert out[1]["text"] == "" and out[2]["text"] == ""
    assert out[1]["n_tokens_removed"] == 12


def test_short_docs_and_line_boundaries(spark):
    """Docs shorter than span_tokens never match; spans repeat across
    LINE boundaries (the case linedup cannot catch)."""
    # the shared passage spans a newline at different positions
    docs = _docs(
        spark,
        [
            (1, f"{_uniq('p', 3)}\n{_SHARED}\n{_uniq('q', 3)}"),
            (2, f"{_uniq('r', 5)} {_SHARED.replace(' quote6', chr(10) + 'quote6')}"),
            (3, "tiny doc"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(docs, span_tokens=8).collect()
    }
    assert out[1]["n_tokens_removed"] == 12
    assert out[2]["n_tokens_removed"] == 12
    assert out[2]["text"] == _uniq("r", 5)
    assert out[3]["text"] == "tiny doc"
    assert out[3]["n_tokens_removed"] == 0


def test_repeated_span_windows_thresholds(spark):
    docs = _docs(
        spark,
        [
            (1, f"{_uniq('a', 4)} {_SHARED}"),
            (2, f"{_SHARED} {_uniq('b', 4)}"),
            (3, _uniq("c", 15)),
        ],
    )
    wins = repeated_span_windows(docs, span_tokens=8, min_count=2)
    # a 12-token passage at L=8 -> 12-8+1 = 5 repeated windows
    assert wins.count() == 5
    assert wins.agg(F.min("n_occurrences")).collect()[0][0] == 2
    # raising min_count past the plant empties the set
    assert repeated_span_windows(docs, span_tokens=8, min_count=3).count() == 0
    with pytest.raises(ValueError):
        repeated_span_windows(docs, span_tokens=0)
    with pytest.raises(ValueError):
        repeated_span_windows(docs, min_count=1)


def test_plan_no_cartesian_no_python(spark):
    docs = _docs(spark, [(1, _uniq("a", 30)), (2, _uniq("b", 30))])
    plan = remove_repeated_spans(docs, span_tokens=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
