"""Per-document TF-IDF keyword extraction (operators/tfidf)."""

from __future__ import annotations

import pytest

from azure_databricks_lakehouse_spark.operators.tfidf import tfidf_topk_terms


def _docs(spark):
    rows = [
        (1, "cat cat sat on the mat with the cat"),
        (2, "dog dog sat on the log near the dog"),
        (3, "the cat and the dog shared the mat"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_distinctive_terms_outrank_ubiquitous_ones(spark):
    out = tfidf_topk_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    top1 = {d: sorted(v)[0][1] for d, v in by_doc.items()}
    # tf ties broken by idf: "the" (df=3) loses to the doc's topic term
    # (df=2) at equal-or-higher tf
    assert top1[1] == "cat" and top1[2] == "dog"
    assert all(len(v) == 2 for v in by_doc.values())
    # deterministic rational score: tf * (N+1)/(df+1) with N=3
    cat1 = next(r for r in out if r["doc_id"] == 1 and r["term"] == "cat")
    assert cat1["tf"] == 3 and cat1["score"] == 3 * 4 / 3


def test_edges_and_validation(spark):
    docs = _docs(spark).union(
        spark.createDataFrame([(9, "   ")], "doc_id int, text string")
    )
    out = tfidf_topk_terms(docs, k=100)
    assert out.filter("doc_id = 9").count() == 0  # token-less doc absent
    # k larger than vocab: every (doc, term) pair surfaces exactly once
    assert out.count() == out.select("doc_id", "term").distinct().count()
    with pytest.raises(ValueError, match="k must be"):
        tfidf_topk_terms(docs, k=0)
