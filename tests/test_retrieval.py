"""BM25 sparse retrieval + reciprocal-rank fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)

_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat around the yard"),
    (3, "a zebra grazed on the open plain"),
    (4, "stock markets rallied after the report on trade"),
    (5, "the cat and the dog slept near the warm stove"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or _DOCS, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, text string")


def test_bm25_ranks_matching_terms_first(spark):
    out = bm25_topk(
        _docs(spark), _queries(spark, [(100, "zebra plain")]), k=3
    ).collect()
    assert out[0]["doc_id"] == 3 and out[0]["rank"] == 1
    # docs without any query term never appear
    assert all(r["doc_id"] == 3 for r in out)


def test_bm25_idf_prefers_rare_terms(spark):
    """'zebra' (df=1) must outweigh 'cat' (df=3): a doc matching only
    the rare term beats a doc matching only the common one."""
    out = bm25_topk(
        _docs(spark), _queries(spark, [(100, "zebra cat")]), k=5
    ).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[3] == 1
    assert all(ranks[3] < ranks[d] for d in ranks if d != 3)


def test_bm25_length_normalization(spark):
    """Same tf for the query term: the shorter document scores higher."""
    docs = _docs(
        spark,
        [
            (1, "quantum leap"),
            (2, "quantum physics is a long and winding subject of study"),
            (3, "nothing relevant here at all"),
        ],
    )
    scores = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, _queries(spark, [(1, "quantum")])).collect()
    }
    assert set(scores) == {1, 2}
    assert scores[1] > scores[2]


def test_bm25_exclude_self_and_determinism(spark):
    docs = _docs(spark)
    qs = docs.select(F.col("doc_id").alias("query_id"), "text")
    out = bm25_topk(docs, qs, k=3, exclude_self=True)
    rows = out.collect()
    assert all(r["doc_id"] != r["query_id"] for r in rows)
    # cat/dog doc 5 is the nearest neighbor of doc 2 and vice versa
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert sorted(by_q[2])[0][1] == 5
    # repeated runs (fresh plans) give identical rankings
    again = bm25_topk(docs, qs, k=3, exclude_self=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_rrf_fusion_prefers_consensus(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 13, 3)], "query_id long, doc_id long, rank int"
    )
    fused = rrf_fuse([a, b], k=4).collect()
    order = [r["doc_id"] for r in sorted(fused, key=lambda r: r["rank"])]
    # 10 and 11 appear high in BOTH lists and must outrank 12/13;
    # 10: 1/61+1/62 == 11: 1/62+1/61 -> exact tie, broken by item id
    assert order[:2] == [10, 11]
    assert set(order[2:]) == {12, 13}
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_single_list_is_identity_order(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 12, 1)], "query_id long, doc_id long, rank int"
    )
    fused = sorted(rrf_fuse([a], k=5).collect(), key=lambda r: (r["query_id"], r["rank"]))
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in fused] == [
        (1, 10, 1), (1, 11, 2), (2, 12, 1),
    ]


def test_plan_no_cartesian_no_python(spark):
    docs = _docs(spark)
    qs = _queries(spark, [(1, "cat"), (2, "zebra stove")])
    plan = (
        bm25_topk(docs, qs, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the only product is the broadcast scalar-stats attach
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_bm25_max_df_cut_drops_head_terms(spark):
    """With max_df_frac, a term in every document stops scoring: a doc
    matching ONLY via the ubiquitous term drops out of the results."""
    docs = _docs(
        spark,
        [
            (1, "common zebra words"),
            (2, "common words here"),
            (3, "common other thing"),
            (4, "common thing again"),
        ],
    )
    q = _queries(spark, [(1, "common zebra")])
    all_docs = {r["doc_id"] for r in bm25_scores(docs, q).collect()}
    assert all_docs == {1, 2, 3, 4}
    cut = {r["doc_id"] for r in bm25_scores(docs, q, max_df_frac=0.5).collect()}
    assert cut == {1}, "only the zebra carrier survives the df cut"
