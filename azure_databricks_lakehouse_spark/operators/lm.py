"""Distributed n-gram language-model perplexity scoring, zero-UDF.

The second standard quality signal for LLM training corpora (alongside
the NB classifier in ``operators/quality``): CCNet filters Common Crawl
by the perplexity of a KenLM 5-gram model trained on Wikipedia — text
that the reference-domain LM finds "surprising" is boilerplate, spam, or
gibberish.  This module re-expresses the pattern Spark-first as a
**bigram stupid-backoff** model (Brants et al. 2007 — the smoothing
Google used precisely because it needs no iterative discounting and
scales to distributed count tables):

- **Training is two aggregation passes** over the reference corpus
  (unigram counts, bigram counts) — no gradient loop, no driver-side
  model state beyond one scalar total.  ``min_count`` prunes the long
  tail so the model stays broadcastable no matter the reference size
  (counts below the cut carry negligible probability mass anyway).
- **Scoring is broadcast joins**: corpus bigrams explode, join the
  bigram/unigram count tables map-side, per-gram log-scores reduce to a
  per-document mean with one partial-aggregated shuffle on the doc key.
  The corpus is touched exactly once; nothing corpus-sized shuffles
  except the (doc_id, partial-sum) reduce.

Stupid backoff: S(w2|w1) = c(w1 w2)/c(w1) when the bigram is known,
else 0.4 * c(w2)/N, else 0.4 * alpha/N for out-of-vocabulary words —
scores, not normalized probabilities, which is exactly what a relative
quality RANKING needs (CCNet thresholds on percentiles, not absolute
perplexity).

Scale: the model tables are vocabulary-bounded (``min_count`` caps
them), the reference corpus is curated-small by construction, and the
scoring pass is one explode + two broadcast joins + one partial-agg
reduce — the same shape as ``operators/quality.score_quality``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.text import norm_text

_BACKOFF = 0.4


def _doc_tokens(text_col: str):
    return F.filter(F.split(norm_text(F.col(text_col)), " "), lambda t: t != "")


def _doc_bigrams(text_col: str):
    toks = _doc_tokens(text_col)
    width = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, width),
        F.slice(toks, 2, width),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


@dataclass(frozen=True)
class NgramLM:
    """A trained stupid-backoff bigram model: two count tables plus the
    corpus token total.  Both tables are ``min_count``-pruned and meant
    to be broadcast at scoring time."""

    unigrams: DataFrame  # (w, c1)
    bigrams: DataFrame  # (w1, w2, c2)
    total_tokens: int


def train_ngram_lm(
    ref: DataFrame, text_col: str = "text", min_count: int = 2
) -> NgramLM:
    """Train on a reference ("good") corpus — e.g. the curated slice a
    CCNet-style filter treats as in-domain.  Two shuffles total, each an
    aggregation over exploded grams with map-side partial counts."""
    toks = ref.select(F.explode(_doc_tokens(text_col)).alias("w"))
    unigrams = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .filter(F.col("c1") >= min_count)
    )
    bigrams = (
        ref.select(F.explode(_doc_bigrams(text_col)).alias("g"))
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    # one scalar — the only driver-side state
    total = toks.count()
    return NgramLM(unigrams=unigrams, bigrams=bigrams, total_tokens=total)


def score_perplexity(
    docs: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document log2 perplexity under the reference LM — LOWER is
    more in-domain.  Returns ``(id_col, log2_ppl, n_grams)``; documents
    with fewer than two tokens score NULL (no bigram evidence — let the
    caller route them to a length rule instead of a fake number).

    Plan shape: explode → two broadcast joins (bigram, unigram backoff)
    → partial-agg groupBy on the document key.  OOV backoff uses
    ``alpha / total_tokens`` so unseen words are penalized smoothly
    rather than saturating at -inf."""
    # explode_outer keeps zero-bigram documents as one NULL-gram row, so
    # they surface with a NULL score WITHOUT a corpus-sized join-back
    grams = docs.select(
        F.col(id_col), F.explode_outer(_doc_bigrams(text_col)).alias("g")
    ).select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    n = float(lm.total_tokens or 1)
    uni_prev = F.broadcast(
        lm.unigrams.select(F.col("w").alias("w1"), F.col("c1").alias("c_prev"))
    )
    uni_next = F.broadcast(
        lm.unigrams.select(F.col("w").alias("w2"), F.col("c1").alias("c_next"))
    )
    big = F.broadcast(lm.bigrams)
    joined = (
        grams.join(big, ["w1", "w2"], "left")
        .join(uni_prev, ["w1"], "left")
        .join(uni_next, ["w2"], "left")
    )
    score = (
        F.when(F.col("w1").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("c2").isNotNull() & F.col("c_prev").isNotNull(),
            F.col("c2") / F.col("c_prev"),
        )
        .when(
            F.col("c_next").isNotNull(),
            F.lit(_BACKOFF) * F.col("c_next") / F.lit(n),
        )
        .otherwise(F.lit(_BACKOFF * alpha) / F.lit(n))
    )
    return joined.groupBy(id_col).agg(
        (-F.avg(F.log2(score))).cast("double").alias("log2_ppl"),
        F.sum(F.when(F.col("w1").isNotNull(), 1).otherwise(0)).alias("n_grams"),
    )
