"""Per-document TF-IDF top-k terms (keyword extraction), zero-UDF.

The classic per-document salience ranking — term frequency times
inverse document frequency — used for keyword tagging, topic labeling,
and cheap retrieval features over a training corpus.  Complements
:mod:`operators.retrieval` (BM25 ranks DOCUMENTS for a query; this
ranks TERMS within each document).

Determinism note: the idf here is the ln-free rational smoothing
``idf = (N + 1) / (df + 1)`` so ``score = tf * idf`` is a product and
quotient of small exact integers — bit-identical in ANY engine.  A
``log``-based idf would hash-diverge across libm implementations while
ordering identically; the rational form is order-equivalent per
document (monotone in ``tf / (df + 1)``) and oracle-exact.

Scale shape: one hash-aggregate on ``(doc, term)`` (map-side partials
over the token stream), one vocabulary-sized aggregate on the term, a
term-keyed join to attach df (AQE broadcasts the vocabulary side when
it fits, else a co-partitioned sort-merge — never a cartesian), a
1-row broadcast for the corpus doc count, and a per-document window
for top-k whose state is bounded by each document's own distinct-term
count.  Nothing is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_topk_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    tokens=None,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    ``(id, term, tf, score, rank)`` with ``rank`` 1-based, ties broken
    by term so the result is total-ordered.  ``tokens`` overrides the
    default whitespace tokenizer with any ``array<string>`` Column."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = (
        tokens
        if tokens is not None
        else F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        )
    )
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))  # 1-row corpus total
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("__n_docs") + 1)
            / (F.col("__df") + 1),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )
