"""Document quality scoring: hashed n-gram linear classifier, zero-UDF.

The production pattern behind CCNet / fastText-style quality filters for
LLM training corpora: documents are scored by a linear model over hashed
word-n-gram features, trained from a labeled sample (e.g. "looks like
Wikipedia" vs "random crawl"), and the corpus is culled on the score.
The reference pipeline's quality tier stops at rule thresholds
(`silver`'s DQ gates; q25's stopword heuristics) — this operator is the
learned upgrade, built so both halves stay inside Catalyst:

- **Features**: word n-grams hashed into ``n_buckets`` ids with
  ``xxhash64 % n_buckets`` (the hashing trick — vocabulary-free, fixed
  width, collision-tolerant), via explode + projection.  No vocabulary
  build, no UDF.
- **Training** is ONE aggregation pass, not an iterative fit: per-bucket
  naive-Bayes log-odds ``w_b = log(P(b|pos)/P(b|neg))`` with add-α
  smoothing.  One groupBy over the exploded n-grams of the labeled
  sample produces the whole weight table; no gradient loop, no driver
  math beyond two scalar totals.  (NB log-odds is the classic closed-form
  linear text classifier — Wang & Manning 2012's NBSVM baseline.)
- **Scoring** is a broadcast join: corpus n-grams → bucket → join the
  weight table (metadata-sized: ≤ n_buckets rows) → per-document MEAN
  weight through a sigmoid.  Unseen buckets contribute 0 (the prior).
  Cost: one map-side join + one hash aggregate per corpus — no shuffle
  of anything corpus-sized except the per-document reduce.

Scale: the weight table is bounded by ``n_buckets`` (default 2^18 ≈
262k rows ≈ 4 MB) regardless of corpus size — always broadcastable; the
labeled training sample is small by construction (labels are expensive);
scoring touches the corpus exactly once.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.text import norm_text

_DEFAULT_BUCKETS = 1 << 18


def _ngram_buckets(
    text: Column, *, n: int, n_buckets: int
) -> Column:
    """Array of hashed word-n-gram bucket ids for a text column."""
    toks = F.split(norm_text(text), " ")
    if n == 1:
        grams = toks
    elif n == 2:
        width = F.greatest(F.size(toks) - 1, F.lit(0))
        grams = F.zip_with(
            F.slice(toks, 1, width),
            F.slice(toks, 2, width),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    else:
        raise ValueError(f"n={n} not supported (use 1 or 2)")
    return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)))


def train_quality_scorer(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n: int = 2,
    n_buckets: int = _DEFAULT_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """One-pass closed-form fit: ``(bucket, weight)`` where weight is the
    smoothed naive-Bayes log-odds of the bucket under positive
    (``label_col`` truthy) vs negative documents.

    The entire fit is one explode + one groupBy + a 2-row totals
    aggregate joined back as a broadcast — no iteration, so "training"
    costs the same as one scan of the (small, labeled) sample."""
    grams = labeled.select(
        F.col(label_col).cast("boolean").alias("_pos"),
        F.explode(
            _ngram_buckets(F.col(text_col), n=n, n_buckets=n_buckets)
        ).alias("bucket"),
    )
    per_bucket = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("n_neg"),
    )
    totals = grams.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("t_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("t_neg"),
    )
    # log((n_pos+α)/(t_pos+α·B)) − log((n_neg+α)/(t_neg+α·B))
    smooth_b = float(alpha) * n_buckets
    return (
        per_bucket.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("n_pos") + F.lit(float(alpha))) / (F.col("t_pos") + F.lit(smooth_b)))
                - F.log((F.col("n_neg") + F.lit(float(alpha))) / (F.col("t_neg") + F.lit(smooth_b)))
            ).alias("weight"),
        )
    )


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = _DEFAULT_BUCKETS,
) -> DataFrame:
    """``(id_col, n_grams, quality_score)`` — sigmoid of the mean bucket
    weight, in (0, 1); > 0.5 means the model leans positive.  Documents
    with no n-grams (shorter than ``n`` words) score at the 0.5 prior.

    The weight table is broadcast BY CONTRACT (≤ n_buckets rows — fixed
    at model build, corpus-independent), so the join is map-side; the
    only corpus-wide exchange is the per-document aggregate."""
    grams = df.select(
        id_col,
        F.explode_outer(
            _ngram_buckets(F.col(text_col), n=n, n_buckets=n_buckets)
        ).alias("bucket"),
    )
    scored = (
        grams.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.avg(F.coalesce("weight", F.lit(0.0))), F.lit(0.0)).alias("_mean_w"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_mean_w")))).alias(
            "quality_score"
        ),
    )
