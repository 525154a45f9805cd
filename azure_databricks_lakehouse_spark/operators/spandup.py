"""Exact repeated-SPAN removal (ExactSubstr-style dedup), zero-UDF.

The third granularity of exact dedup, between whole-document
(`operators/dedup`, q27 ``part='doc'``) and line (`operators/linedup`):
remove TOKEN SPANS that repeat across the corpus regardless of line or
document boundaries — quoted passages, syndicated paragraphs, license
headers reflowed into prose.  This is the Spark-native counterpart of
the suffix-array ExactSubstr dedup of Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better"): where they find repeated
byte substrings with one global suffix array (inherently single-machine
or sharded-with-merge), we hash every ``span_tokens``-token sliding
window and keep windows whose hash repeats.  A shared passage of
``M >= span_tokens`` tokens produces exactly the ``M - span_tokens + 1``
repeated windows whose union covers the passage and nothing else, so
removal is EXACT for passages at least one window long — the same
guarantee the suffix array gives at its length threshold, without the
global sort.

Spark-first shape (all built-in expressions, no Python in the plan):

- window hashes via one projection: ``transform(sequence(...))`` over
  the token array + ``posexplode`` — one row per token position, linear
  in corpus size, no shuffle;
- the repeated-window set is one hash aggregate on the window key
  (map-side partial counts first — wire volume is distinct windows per
  partition);
- marking is an inner join of window rows against the repeated set —
  pre-filtered to ``count >= min_count`` so AQE broadcasts the
  (head-heavy, small) repeated set when it fits and degrades to a
  co-partitioned hash join otherwise, never a cartesian;
- per-document interval merge is ``aggregate`` over the SORTED start
  set (state = that document's own repeated-window starts), and the
  rebuild is one projection that keeps tokens outside the merged
  intervals.  Documents with no repeated span never enter the groupBy —
  they pass through the final left join untouched.

Rebuilt text is single-space token-joined (the tokenizer is whitespace
``\\s+``); runs of whitespace do not survive removal, same as every
token-level dedup in this package.

Window keys are ``xxhash64`` of the joined window — at 10^13 windows
(100 TB of text) the 64-bit birthday bound admits a few million hash
collisions corpus-wide, each of which can mark one innocent window as
repeated.  That false-positive rate (~1e-7 of tokens) is noise next to
the thresholds involved; where it is not acceptable, verify marked
windows with an exact join on the window text (same shuffle key) before
removal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    return F.when(F.length(F.trim(text)) == 0, F.array()).otherwise(toks)


def repeated_span_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    span_tokens: int = 20,
    min_count: int = 2,
    max_len: int | None = None,
) -> DataFrame:
    """``(window_key, n_occurrences)`` for every ``span_tokens``-token
    sliding window whose exact token sequence occurs at least
    ``min_count`` times corpus-wide (within- and cross-document
    occurrences both count, as in ExactSubstr).  ``max_len`` bounds the
    token array per document (skew guard, same knob as winnowing)."""
    if span_tokens < 1:
        raise ValueError("span_tokens must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    # materialize the token array BEFORE the window lambda: expressions
    # referenced inside a higher-order-function lambda are re-evaluated
    # per element (no subexpression elimination across the lambda
    # boundary), so leaving the regex split inline re-tokenizes the
    # whole document once per window — O(len²) per doc, measured 7×
    # slower at sf0.1
    base = docs.select(_mat_tokens(docs, text_col, max_len).alias("__toks"))
    n = F.size(F.col("__toks"))
    keys = _window_keys(F.col("__toks"), n, span_tokens)
    windows = base.select(
        F.explode(F.when(n >= span_tokens, keys).otherwise(F.array())).alias(
            "window_key"
        )
    )
    return (
        windows.groupBy("window_key")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def _mat_tokens(docs: DataFrame, text_col: str, max_len: int | None):
    toks = _tokens(F.col(text_col))
    if max_len is not None:
        toks = F.slice(toks, 1, max_len)
    return toks


def _window_keys(toks_attr: Column, n: Column, span_tokens: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), n - span_tokens),
        lambda i: F.xxhash64(
            F.array_join(F.slice(toks_attr, i + 1, span_tokens), " ")
        ),
    )


def remove_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    span_tokens: int = 20,
    min_count: int = 2,
    max_len: int | None = None,
) -> DataFrame:
    """The input columns with ``text_col`` rebuilt minus every token
    covered by a corpus-repeated span, plus ``n_tokens_removed`` and
    ``n_spans_removed`` (count of maximal removed regions).  Documents
    without a repeated span pass through with their tokens re-joined
    unchanged (single-spaced); a document that is entirely repeated
    spans survives with empty text — dropping is the caller's policy
    (filter on the audit columns), unlike line-dedup where a
    no-surviving-lines document has no group to aggregate."""
    repeated = repeated_span_windows(
        docs,
        text_col,
        id_col,
        span_tokens=span_tokens,
        min_count=min_count,
        max_len=max_len,
    )

    sbase = docs.select(
        F.col(id_col), _mat_tokens(docs, text_col, max_len).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    keys = _window_keys(F.col("__toks"), n, span_tokens)
    starts = sbase.select(
        F.col(id_col),
        F.posexplode(F.when(n >= span_tokens, keys).otherwise(F.array())).alias(
            "__start", "window_key"
        ),
    )
    hits = starts.join(repeated, "window_key").select(id_col, "__start")

    # maximal removed regions: fold the sorted start set into merged
    # [lo, hi) intervals — windows [s, s+L) and [s', s'+L) merge when
    # s' <= s + L (adjacent or overlapping)
    merged = (
        hits.groupBy(id_col)
        .agg(F.array_sort(F.collect_set("__start")).alias("__starts"))
        .select(
            id_col,
            F.aggregate(
                F.col("__starts"),
                F.array().cast("array<struct<lo:long,hi:long>>"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (s <= F.element_at(acc, -1)["hi"]),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.struct(
                                F.element_at(acc, -1)["lo"].alias("lo"),
                                (s + span_tokens).cast("long").alias("hi"),
                            )
                        ),
                    ),
                ).otherwise(
                    F.concat(
                        acc,
                        F.array(
                            F.struct(
                                s.cast("long").alias("lo"),
                                (s + span_tokens).cast("long").alias("hi"),
                            )
                        ),
                    )
                ),
            ).alias("__intervals"),
        )
    )

    other_cols = [c for c in docs.columns if c != text_col]
    out = (
        docs.join(merged, id_col, "left")
        # materialized ONCE per row (see the lambda-boundary note above):
        # the kept-filter lambda and both size() audits read attributes,
        # never re-tokenize
        .withColumn("__toks", _mat_tokens(docs, text_col, max_len))
        .withColumn(
            "__ivs",
            F.coalesce(
                F.col("__intervals"),
                F.array().cast("array<struct<lo:long,hi:long>>"),
            ),
        )
    )
    # keep token positions outside every merged interval; intervals per
    # document are few (merged, disjoint), so the exists() scan is cheap
    kept = F.filter(
        F.col("__toks"),
        lambda _t, i: ~F.exists(
            F.col("__ivs"), lambda v: (i >= v["lo"]) & (i < v["hi"])
        ),
    )
    out = out.withColumn("__kept", kept)
    return out.select(
        *other_cols,
        F.array_join(F.col("__kept"), " ").alias(text_col),
        (F.size(F.col("__toks")) - F.size(F.col("__kept")))
        .cast("long")
        .alias("n_tokens_removed"),
        F.size(F.col("__ivs")).cast("long").alias("n_spans_removed"),
    )
