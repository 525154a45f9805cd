"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

Learns byte-pair-encoding merge rules over a corpus and tokenizes with
them — the vocabulary-building step every LLM training pipeline runs
before token counting or sequence packing means anything.  The reference
pipeline stops at ingest/quality tiers (`/root/reference/README.md:31-36`
gold "business-level aggregates"); this extends the same medallion corpus
into tokenizer territory using only DataFrame ops.

Scale shape — the part that matters at 100 TB:

- The corpus-sized job happens ONCE: pre-tokenize + explode + count into
  a **word frequency table** (`word, count`).  Its row count is the
  *distinct vocabulary* of the corpus (~10M rows for web-scale text),
  thousands of times smaller than the corpus, and it is the only thing
  the merge loop ever touches.  This is exactly how the original BPE
  trainer escapes corpus scale, re-expressed distributed.
- Each merge round over that table is: one map-side pair explode + one
  hash aggregate (map-side partials) + a **1-row collect** (the argmax
  pair) + a map-side rewrite of the symbol arrays.  No corpus rescan,
  no growing lineage — rounds are ``localCheckpoint``-truncated like the
  connected-components loop (`operators/components.py`).
- Application (:func:`tokenize_with_vocab`) is a JOIN, not a codec: the
  learned segmentation is a ``word -> pieces`` lookup table, documents
  explode into words, join (broadcast when the vocab is small, shuffle
  otherwise — AQE's call), and explode into tokens.  Zero UDFs, so the
  engine's zero-UDF core property (SURVEY.md §2.10) holds; a production
  pipeline would swap in a native tokenizer library at exactly this
  seam.

Semantics match the reference Sennrich algorithm exactly (greedy
left-to-right merge application, adjacent-pair counts weighted by word
frequency); ties on pair count break deterministically by (pair_a,
pair_b) string order so reruns and engines agree.  Verified in
``tests/test_bpe.py`` against an independent pure-Python implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.text import norm_text

# GPT-2-family pre-tokenizer shape shared with q49 (queries/text_ops.py):
# letter runs / digit runs / punctuation runs, optionally space-prefixed.
_PRETOKEN_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def word_frequency_table(
    df: DataFrame, *, text_col: str = "text", pretoken_re: str = _PRETOKEN_RE
) -> DataFrame:
    """``(word, count)`` over the whole corpus — the single corpus-scale
    pass of BPE training.  Normalizes like q49 (lowercase, whitespace
    collapse) so the pre-tokens match the token-counting query's."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(norm_text(text_col), F.lit(pretoken_re), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def _char_split(word: Column) -> Column:
    """Word -> array of single-character symbols.  ``transform`` over
    explicit positions, not ``split(word, '')``, so the expression is
    total and has no engine-specific empty-string edge."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )


def _merge_pair(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) to a symbol
    array — the exact Sennrich replacement order: scanning left to
    right, whenever the accumulator's last symbol is ``a`` and the next
    is ``b``, fuse them (so ``aaa`` under (a,a) becomes [aa, a])."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    pretoken_re: str = _PRETOKEN_RE,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.

    Returns ``(merges, vocab)`` where ``merges`` is the ordered rule
    list and ``vocab`` is the segmented word table
    ``(word, count, pieces array<string>)`` with every rule applied —
    ready to drive :func:`tokenize_with_vocab` with no re-derivation.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency): merging
    singleton pairs just memorizes individual words.

    Driver traffic is one argmax ROW per round; every per-round job runs
    over the vocabulary table only.  ``localCheckpoint`` after each
    rewrite keeps the plan flat (50 rounds of nested ``aggregate``
    lambdas would otherwise stack into one giant expression tree) and
    materializes the round exactly once for both the next pair count
    and the next rewrite.
    """
    vocab = word_frequency_table(
        df, text_col=text_col, pretoken_re=pretoken_re
    ).withColumn("pieces", _char_split(F.col("word")))
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "count",
            F.explode(
                F.zip_with(
                    F.slice(F.col("pieces"), 1, F.size("pieces") - 1),
                    F.slice(F.col("pieces"), 2, F.size("pieces") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair.a", "pair.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # only rows containing the fused pair change; the WHEN gate keeps
        # the rewrite a cheap contains-check for the rest of the vocab
        has_pair = F.array_position(
            F.zip_with(
                F.slice(F.col("pieces"), 1, F.size("pieces") - 1),
                F.slice(F.col("pieces"), 2, F.size("pieces") - 1),
                lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
            ),
            True,
        ) > 0
        vocab = vocab.withColumn(
            "pieces",
            F.when(has_pair, _merge_pair(F.col("pieces"), a, b)).otherwise(
                F.col("pieces")
            ),
        ).localCheckpoint(eager=True)
    return merges, vocab


def tokenize_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretoken_re: str = _PRETOKEN_RE,
) -> DataFrame:
    """Tokenize documents with a learned segmentation table:
    ``(id_col, word_pos, piece_pos, token)`` — one row per BPE token;
    ``(word_pos, piece_pos)`` sorts tokens into document order.

    The vocab join is the scale seam: the segmentation table is
    vocabulary-sized, so AQE broadcasts it under real corpora (leave the
    choice to the planner — an adversarial vocab should degrade to a
    shuffle join, not an OOM).  Words unseen at train time fall back to
    character pieces, the standard open-vocabulary behavior.
    """
    words = df.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(norm_text(text_col), F.lit(pretoken_re), 0)
        ).alias(
            "word_pos", "word"
        ),
    )
    seg = vocab.select("word", "pieces")
    joined = words.join(seg, "word", "left").select(
        id_col,
        "word_pos",
        F.coalesce(F.col("pieces"), _char_split(F.col("word"))).alias("pieces"),
    )
    return joined.select(
        id_col,
        "word_pos",
        F.posexplode("pieces").alias("piece_pos", "token"),
    ).select(id_col, "word_pos", "piece_pos", "token")
