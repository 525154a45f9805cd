"""Hashed n-gram quality scorer: closed-form NB log-odds training,
broadcast-join scoring, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.quality import (
    score_quality,
    train_quality_scorer,
)
from azure_databricks_lakehouse_spark.plans import physical_plan

_GOOD = [
    "the committee published its annual report on regional water quality",
    "researchers at the university measured the effect of light on plant growth",
    "the library extended its opening hours after public consultation",
    "a new bridge connects the two districts across the river",
    "the orchestra performed a complete cycle of the symphonies this season",
]
_SPAM = [
    "click here buy now cheap cheap best price click here win",
    "free money win prize click now buy buy buy discount",
    "hot deal best price free shipping click click win now",
    "win win free prize money now click here best deal",
    "buy cheap now free win prize click deal deal deal",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(_GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(_SPAM)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, label int")


def test_scorer_separates_good_from_spam(spark):
    labeled = _labeled(spark)
    w = train_quality_scorer(labeled)
    # score held-out texts drawn from the same distributions
    test = spark.createDataFrame(
        [
            (1, "the university library published a report on the river bridge", 1),
            (2, "click now win free money best cheap prize deal", 0),
        ],
        "doc_id int, text string, label int",
    )
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(test, w).collect()}
    assert got[1] > 0.5 > got[2]


def test_short_doc_scores_at_prior(spark):
    w = train_quality_scorer(_labeled(spark))
    one_word = spark.createDataFrame(
        [(9, "hello")], "doc_id int, text string"
    )
    r = score_quality(one_word, w).collect()[0]
    assert r["n_grams"] == 0 and abs(r["quality_score"] - 0.5) < 1e-12


def test_training_is_deterministic(spark):
    labeled = _labeled(spark)
    w1 = sorted(map(tuple, train_quality_scorer(labeled).collect()))
    w2 = sorted(map(tuple, train_quality_scorer(labeled).collect()))
    assert w1 == w2


def test_scoring_plan_broadcasts_weights(spark):
    w = train_quality_scorer(_labeled(spark))
    scored = score_quality(_labeled(spark), w)
    plan = physical_plan(scored)
    assert "BroadcastHashJoin" in plan
    # corpus-side exchanges: only the per-document aggregate's shuffle
    # (plus broadcast exchanges, which move the weight table, not corpus)
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) <= 2  # weight-build agg + per-doc agg
