"""CCNet-style n-gram LM perplexity: in-domain text must score lower
(less surprising) than gibberish under a model trained on the reference
corpus, with broadcast-join scoring and no corpus-sized shuffles beyond
the per-document reduce."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.lm import (
    NgramLM,
    score_perplexity,
    train_ngram_lm,
)

_REF_SENTENCES = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat chased the dog",
    "a dog chased a cat on the mat",
    "the cat and the dog sat together",
    "the mat was on the floor",
    "the dog slept on the mat",
    "a cat slept on the rug",
] * 3  # repetition pushes counts past min_count


def _ref(spark):
    return spark.createDataFrame([(s,) for s in _REF_SENTENCES], "text string")


def test_in_domain_scores_below_gibberish(spark):
    lm = train_ngram_lm(_ref(spark), min_count=2)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),  # verbatim in-domain
            (2, "the dog slept on the rug"),  # in-domain recombination
            (3, "zq xv plork wug fnord blarg"),  # gibberish, all OOV
            (4, "mat the on sat cat the"),  # right words, wrong order
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["log2_ppl"] for r in score_perplexity(docs, lm).collect()}
    assert got[1] < got[3] and got[2] < got[3]
    assert got[1] < got[4] < got[3]  # scrambled beats gibberish, loses to fluent


def test_short_and_empty_docs_score_null(spark):
    lm = train_ngram_lm(_ref(spark))
    docs = spark.createDataFrame(
        [(1, "cat"), (2, ""), (3, None), (4, "the cat sat")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in score_perplexity(docs, lm).collect()}
    assert len(rows) == 4, "every document must surface exactly once"
    for d in (1, 2, 3):
        assert rows[d]["log2_ppl"] is None and rows[d]["n_grams"] == 0
    assert rows[4]["log2_ppl"] is not None and rows[4]["n_grams"] == 2


def test_min_count_prunes_model_tables(spark):
    ref = spark.createDataFrame(
        [("common words common words",), ("rare singleton appears once",)],
        "text string",
    )
    lm2 = train_ngram_lm(ref, min_count=2)
    vocab = {r["w"] for r in lm2.unigrams.collect()}
    assert "common" in vocab and "singleton" not in vocab
    # pruning must not break scoring (pruned words take the OOV branch)
    docs = spark.createDataFrame([(1, "rare singleton appears")], "doc_id int, text string")
    assert score_perplexity(docs, lm2).first()["log2_ppl"] is not None


def test_scoring_plan_broadcasts_model(spark):
    lm = train_ngram_lm(_ref(spark))
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id int, text string"
    )
    plan = (
        score_perplexity(docs, lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_documents_table_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text_col = "text" if "text" in docs.columns else docs.columns[1]
    ref = docs.limit(200)
    lm = train_ngram_lm(ref, text_col=text_col, min_count=2)
    assert isinstance(lm, NgramLM) and lm.total_tokens > 0
    scored = score_perplexity(
        docs.limit(500), lm, text_col=text_col, id_col=docs.columns[0]
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("log2_ppl").isNotNull(), 1).otherwise(0)).alias("ok"),
    ).first()
    assert agg["n"] == 500 and agg["ok"] > 0
