"""DSIR importance resampling (`operators/dsir`): Xie et al. 2023's
data-selection recipe — hashed n-gram bucket models, log-likelihood
ratio scoring, Gumbel top-k resampling.

The reference has no counterpart (its notebooks stop at DQ filtering);
this is part of the LLM-training-data surface the build adds on top.
Scale stance under test: fitting collapses each corpus to ≤ dim bucket
counts before any join, scoring is one broadcast join + one aggregate,
and the top-k is TakeOrderedAndProject — no collect, no cartesian, no
global sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.dsir import (
    feature_counts,
    fit_importance,
    fit_importance_subset,
    importance_resample,
    score_importance,
)
from azure_databricks_lakehouse_spark.plans import (
    assert_no_cartesian,
    physical_plan,
)

_TARGET = [
    (i, "the history of science records careful observation and theory")
    for i in range(8)
]
_GOOD = [
    (100 + i, "science history shows observation and careful theory at work")
    for i in range(6)
]
_SPAM = [
    (200 + i, "buy cheap pills click now win prize casino bonus offer")
    for i in range(6)
]


@pytest.fixture(scope="module")
def corpus(spark):
    target = spark.createDataFrame(_TARGET, "doc_id long, text string")
    pool = spark.createDataFrame(_GOOD + _SPAM, "doc_id long, text string")
    return target, pool


def test_target_like_docs_outrank_spam(spark, corpus):
    target, pool = corpus
    model = fit_importance(target, pool, dim=512)
    scored = score_importance(pool, model)
    rows = {r.doc_id: r.importance for r in scored.collect()}
    good = [rows[d] for d, _ in _GOOD]
    spam = [rows[d] for d, _ in _SPAM]
    assert min(good) > max(spam), (good, spam)
    # and the resampled set is exactly the target-like half
    picked = importance_resample(pool, model, len(_GOOD))
    assert {r.doc_id for r in picked.collect()} == {d for d, _ in _GOOD}


def test_empty_doc_scores_zero(spark, corpus):
    target, _ = corpus
    pool = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "science history")],
        "doc_id long, text string",
    )
    model = fit_importance(target, pool, dim=512)
    rows = {r.doc_id: r.importance for r in score_importance(pool, model).collect()}
    assert rows[1] == 0.0 and rows[2] == 0.0
    assert rows[3] != 0.0


def test_deterministic_under_reshuffle(spark, corpus):
    target, pool = corpus
    model = fit_importance(target, pool, dim=512)
    base = {
        (r.doc_id, r.importance)
        for r in score_importance(pool, model).collect()
    }
    shuffled = {
        (r.doc_id, r.importance)
        for r in score_importance(pool.repartition(7), model).collect()
    }
    # bit-identical doubles: contributions fold bucket-sorted, so the
    # sum order never depends on partitioning
    assert base == shuffled
    k = 5
    p1 = sorted(r.doc_id for r in importance_resample(pool, model, k, seed=3).collect())
    p2 = sorted(
        r.doc_id
        for r in importance_resample(pool.repartition(5), model, k, seed=3).collect()
    )
    assert p1 == p2


def test_feature_counts_shape(spark, corpus):
    _, pool = corpus
    feats = feature_counts(pool, dim=64, bigrams=False)
    assert feats.columns == ["doc_id", "bucket", "n"]
    row = feats.agg(F.max("bucket").alias("mx"), F.min("bucket").alias("mn")).collect()[0]
    assert 0 <= row.mn and row.mx < 64
    # unigram-only: total gram count == total token count
    total = feats.agg(F.sum("n").alias("s")).collect()[0].s
    n_toks = pool.select(
        F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != "")).alias("n")
    ).agg(F.sum("n").alias("s")).collect()[0].s
    assert total == n_toks


def test_smoothing_validation(spark, corpus):
    target, pool = corpus
    with pytest.raises(ValueError, match="smoothing"):
        fit_importance(target, pool, smoothing=0.0)
    with pytest.raises(ValueError, match="smoothing"):
        fit_importance_subset(pool, F.col("doc_id") < 150, smoothing=-1.0)


def test_subset_fit_and_features_arg_match_general_path(spark, corpus):
    """fit_importance_subset (one-pass joint totals) must produce the
    SAME ratios — hence bit-identical scores — as fit_importance on the
    equivalent target/pool split; and score_importance(features=...)
    with a precomputed feature_counts frame matches the self-computed
    path exactly."""
    _, pool = corpus  # target := the doc_id < 150 half of the pool
    general = fit_importance(
        pool.filter(F.col("doc_id") < 150), pool, dim=512
    )
    subset = fit_importance_subset(pool, F.col("doc_id") < 150, dim=512)
    s_gen = {
        (r.doc_id, r.importance)
        for r in score_importance(pool, general).collect()
    }
    s_sub = {
        (r.doc_id, r.importance)
        for r in score_importance(pool, subset).collect()
    }
    assert s_gen == s_sub
    feats = feature_counts(pool, dim=512)
    s_pre = {
        (r.doc_id, r.importance)
        for r in score_importance(pool, subset, features=feats).collect()
    }
    assert s_pre == s_sub
    # the features-based FIT (round 12: one shared explode for fit +
    # score) folds Σn per bucket — identical ratios, identical scores
    fit_pre = fit_importance_subset(
        pool, F.col("doc_id") < 150, dim=512, features=feats
    )
    s_fit_pre = {
        (r.doc_id, r.importance)
        for r in score_importance(pool, fit_pre, features=feats).collect()
    }
    assert s_fit_pre == s_sub
    k = 4
    p1 = sorted(r.doc_id for r in importance_resample(pool, subset, k, seed=1).collect())
    p2 = sorted(
        r.doc_id
        for r in importance_resample(pool, subset, k, seed=1, features=feats).collect()
    )
    assert p1 == p2


def test_plan_shapes(spark, corpus):
    """100 TB discipline: no CartesianProduct anywhere (the two 1-row
    corpus-total attaches are broadcast NLJs over single-row frames —
    metadata, not data); the ratio join onto per-doc features is a
    broadcast hash join; the resample top-k is TakeOrderedAndProject,
    never a global sort."""
    target, pool = corpus
    model = fit_importance(target, pool, dim=512)
    picked = importance_resample(pool, model, 5)
    assert_no_cartesian(picked)
    plan = physical_plan(picked)
    assert "BroadcastHashJoin" in plan  # ratios broadcast onto features
    assert "TakeOrderedAndProject" in plan
    # the only NLJs are the two single-row total attaches
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_streaming_importance_screen_matches_batch(spark, tmp_path):
    """Round-8 verdict item 7: micro-batches screened against a
    PERSISTED ImportanceModel land only above-threshold documents, and
    the landed scores are bit-identical to a single batch scoring run
    of the same corpus (the bucket-sorted fold makes the double
    deterministic under any batching)."""
    import os

    from azure_databricks_lakehouse_spark.operators.dsir import (
        load_importance_model,
        persist_importance_model,
    )
    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable
    from azure_databricks_lakehouse_spark.streaming.jobs import (
        read_file_stream,
        write_importance_screened_stream,
    )

    target = spark.createDataFrame(
        [(i, "solar panels convert sunlight into electric power") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "solar power systems and panels convert energy"),
            (101, "buy cheap pills online casino bonus click here now"),
            (102, "electric power from sunlight with solar panels"),
            (103, "random unrelated chatter about football scores"),
        ],
        "doc_id long, text string",
    )
    model = fit_importance(target, raw, dim=512)
    model_root = str(tmp_path / "model")
    persist_importance_model(model, model_root)
    # round-trip sanity: the persisted model re-hydrates equivalent
    loaded = load_importance_model(spark, model_root)
    assert (loaded.dim, loaded.bigrams, loaded.smoothing) == (
        model.dim,
        model.bigrams,
        model.smoothing,
    )

    batch_scores = {
        r["doc_id"]: r["importance"]
        for r in score_importance(raw, loaded).collect()
    }
    thr = 0.0

    src = str(tmp_path / "src")
    os.makedirs(src)
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")

    def _ingest():
        stream = read_file_stream(spark, src, "doc_id long, text string")
        write_importance_screened_stream(
            stream, dest, model_root, ckpt, threshold=thr
        ).awaitTermination(120)

    # drip the corpus through two micro-batches
    raw.filter("doc_id < 102").write.mode("append").parquet(src)
    _ingest()
    raw.filter("doc_id >= 102").write.mode("append").parquet(src)
    _ingest()

    landed = {
        r["doc_id"]: r["importance"]
        for r in ParquetTable.for_path(spark, dest).read().collect()
    }
    want = {i: s for i, s in batch_scores.items() if s >= thr}
    assert set(landed) == set(want)
    assert landed == want  # bit-identical doubles, not approx
    # the screen actually rejected something (fixture has spammy docs)
    assert set(landed) < set(batch_scores)

    # restart on the same checkpoint with no new files: a no-op
    _ingest()
    assert ParquetTable.for_path(spark, dest).read().count() == len(want)
