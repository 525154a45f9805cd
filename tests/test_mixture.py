"""Temperature-weighted domain mixing: plans must match the published
recipes' math, realization must be deterministic and hit planned
proportions, and rare-domain upsampling must produce distinct epochs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.mixture import (
    mix_corpus,
    plan_mixture,
    realize_mixture,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed corpus: web 2000, books 200, code 50
    df = (
        spark.range(2250)
        .select(
            F.col("id").cast("int").alias("doc_id"),
            F.when(F.col("id") < 2000, "web")
            .when(F.col("id") < 2200, "books")
            .otherwise("code")
            .alias("domain"),
        )
        .cache()
    )
    df.count()
    return df


def test_natural_temperature_is_identity_plan(spark, corpus):
    plan = plan_mixture(corpus, "domain", temperature=1.0)
    assert plan.counts == {"web": 2000, "books": 200, "code": 50}
    for r in plan.rates.values():
        assert r == pytest.approx(1.0)


def test_flattening_upsamples_rare_domains(spark, corpus):
    plan = plan_mixture(corpus, "domain", temperature=0.5)
    assert plan.rates["code"] > 1.0 > plan.rates["web"]
    # expected output stays at input size (pure reweighting)
    assert plan.target_rows == pytest.approx(2250, rel=0.01)
    mixed, _ = mix_corpus(corpus, "domain", temperature=0.5, seed=3)
    got = {
        r["domain"]: r["n"]
        for r in mixed.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for d in got:
        assert got[d] == pytest.approx(plan.rates[d] * plan.counts[d], rel=0.15)
    # upsampled domain rows appear with distinct epoch tags
    reps = (
        mixed.filter("domain = 'code'")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("_epoch").alias("e"))
    )
    assert reps.filter("n >= 2").count() > 0
    assert reps.filter("n != e").count() == 0, "epoch tags must be distinct"


def test_explicit_weights_and_epoch_cap(spark, corpus):
    plan = plan_mixture(
        corpus, "domain", weights={"web": 1, "books": 1, "code": 98},
        max_epochs=3.0,
    )
    assert plan.rates["code"] == 3.0, "cap must bound tiny-domain repetition"
    with pytest.raises(ValueError, match="absent domains"):
        plan_mixture(corpus, "domain", weights={"nope": 1})


def test_realization_is_deterministic_and_seed_sensitive(spark, corpus):
    a, _ = mix_corpus(corpus, "domain", temperature=0.3, seed=1)
    b, _ = mix_corpus(corpus, "domain", temperature=0.3, seed=1)
    c, _ = mix_corpus(corpus, "domain", temperature=0.3, seed=2)
    ka = sorted((r["doc_id"], r["_epoch"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["_epoch"]) for r in b.collect())
    kc = sorted((r["doc_id"], r["_epoch"]) for r in c.collect())
    assert ka == kb
    assert ka != kc


def test_downsampling_to_target(spark, corpus):
    mixed, plan = mix_corpus(
        corpus, "domain", temperature=1.0, target_rows=500, seed=7
    )
    assert plan.target_rows == pytest.approx(500, rel=0.01)
    assert mixed.count() == pytest.approx(500, rel=0.15)


def test_plan_is_shuffle_free_projection(spark, corpus):
    plan = plan_mixture(corpus, "domain", temperature=0.5)
    mixed = realize_mixture(corpus, plan, "domain")
    s = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s, "realization must not shuffle"
    assert "BatchEvalPython" not in s


def test_unlisted_corpus_domains_raise_unless_opted_in(spark, corpus):
    """A partial weights table must not silently delete whole domains
    from the training mix: unlisted corpus domains raise, and the
    explicit opt-out surfaces them in plan.excluded with rate 0."""
    with pytest.raises(ValueError, match="missing from the weights"):
        plan_mixture(corpus, "domain", weights={"web": 1, "books": 1})
    plan = plan_mixture(
        corpus, "domain", weights={"web": 1, "books": 1}, allow_unlisted=True
    )
    assert plan.excluded == ("code",)
    assert plan.rates["code"] == 0.0
