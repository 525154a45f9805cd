"""C4-style page cleaning (Raffel et al., 2020, §2.2 — the published
recipe behind the C4 corpus), zero-UDF.

The C4 cleanup is the canonical first text-level pass of a web-scale
training pipeline: LINE rules keep only prose-shaped lines, PAGE rules
drop pages that are code, placeholder, or policy boilerplate.  The
published rules, re-expressed Spark-first:

- keep only lines ending in terminal punctuation (``. ! ? "``);
- keep only lines with at least ``min_words_per_line`` words;
- drop any line containing the word "javascript" (cookie-wall stubs);
- drop any line containing a policy phrase ("privacy policy",
  "terms of use", "uses cookies", ...);
- drop the PAGE when the cleaned text has fewer than ``min_sentences``
  sentences, contains "lorem ipsum", contains a ``{`` (source code), or
  contains any listed bad word.

The paper's remaining rule — corpus-wide three-sentence-span dedup — is
cross-document state and lives in :mod:`operators.spandup`
(``remove_repeated_spans``); compose it after this pass, as
:func:`pipelines.training.prepare_training_corpus` does for its other
dedup stages.

Scale shape: everything here is ONE whole-stage-codegen projection per
document — ``split`` → ``filter(lambda over the line element)`` →
``array_join`` — with no shuffle, no join, and no UDF.  Every lambda
reads only its own array element (never a recomputed document-level
chain — the lambda-boundary O(len²) trap), so cost is ∝ corpus bytes
and the operator pipelines into whatever scan feeds it.  At 100 TB it
is a map-only stage: partition count and skew are whatever the upstream
scan had.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the paper's policy-boilerplate phrases (§2.2)
DEFAULT_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

_TERMINAL = r'[.!?"]$'


def _line_ok(
    line: Column, min_words: int, policy_phrases: tuple[str, ...]
) -> Column:
    t = F.trim(line)
    low = F.lower(t)
    ok = (
        t.rlike(_TERMINAL)
        & (F.size(F.split(t, r"\s+")) >= min_words)
        & ~low.contains("javascript")
    )
    for p in policy_phrases:
        ok = ok & ~low.contains(p)
    return ok


def _with_c4_columns(
    docs: DataFrame,
    text_col: str,
    min_words_per_line: int,
    min_sentences: int,
    policy_phrases: tuple[str, ...],
    bad_words: list[str] | None,
) -> DataFrame:
    """``docs`` plus the C4 verdict columns (``__cleaned``,
    ``__n_lines``, ``__n_lines_kept``, ``__n_sentences``,
    ``__page_reasons``, ``__keep``) — pure projection, no shuffle."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines, lambda l: _line_ok(l, min_words_per_line, policy_phrases)
    )
    out = docs.withColumns(
        {
            "__cleaned": F.array_join(F.transform(kept, F.trim), "\n"),
            "__n_lines": F.size(lines),
            "__n_lines_kept": F.size(kept),
        }
    ).withColumn(
        "__n_sentences",
        F.length(F.regexp_replace(F.col("__cleaned"), r"[^.!?]", "")),
    )
    low = F.lower(F.col("__cleaned"))
    reasons = [
        F.when(
            F.col("__n_sentences") < min_sentences, F.lit("too_few_sentences")
        ),
        F.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum")),
        F.when(F.col("__cleaned").contains("{"), F.lit("brace")),
    ]
    if bad_words:
        toks = F.split(low, r"[^a-z0-9]+")
        reasons.append(
            F.when(
                F.arrays_overlap(
                    toks, F.array(*[F.lit(w.lower()) for w in bad_words])
                ),
                F.lit("bad_word"),
            )
        )
    return out.withColumn(
        "__page_reasons", F.array_compact(F.array(*reasons))
    ).withColumn("__keep", F.size("__page_reasons") == 0)


def c4_audit(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    policy_phrases: tuple[str, ...] = DEFAULT_POLICY_PHRASES,
    bad_words: list[str] | None = None,
) -> DataFrame:
    """Per-document audit of the C4 rules: one row PER INPUT DOC with
    the cleaned text, line counts, and page verdict — the auditable
    form (:func:`c4_clean` derives kept/removed from the same
    projection).  Columns: ``(id, cleaned, n_lines, n_lines_kept,
    n_sentences, page_reasons array<string> — empty when kept,
    keep boolean)``.

    ``n_sentences`` counts terminal marks (``. ! ?``) in the cleaned
    text — a deterministic, engine-neutral stand-in for sentence
    segmentation (a kept line ending in ``"`` contributes the marks
    inside it)."""
    flagged = _with_c4_columns(
        docs, text_col, min_words_per_line, min_sentences,
        policy_phrases, bad_words,
    )
    return flagged.select(
        F.col(id_col),
        F.col("__cleaned").alias("cleaned"),
        F.col("__n_lines").alias("n_lines"),
        F.col("__n_lines_kept").alias("n_lines_kept"),
        F.col("__n_sentences").alias("n_sentences"),
        F.col("__page_reasons").alias("page_reasons"),
        F.col("__keep").alias("keep"),
    )


@dataclass(frozen=True)
class C4Result:
    """``kept``: surviving rows of the input frame with ``text_col``
    replaced by the cleaned text.  ``removed``: one row per dropped
    page — its id and the page-rule reasons that fired."""

    kept: DataFrame
    removed: DataFrame


def c4_clean(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    policy_phrases: tuple[str, ...] = DEFAULT_POLICY_PHRASES,
    bad_words: list[str] | None = None,
) -> C4Result:
    """Apply the C4 line + page rules to ``docs``; all other columns
    pass through unchanged.  Both outputs are filters over ONE shared
    projection — no join, no shuffle, no second scan."""
    flagged = _with_c4_columns(
        docs, text_col, min_words_per_line, min_sentences,
        policy_phrases, bad_words,
    )
    aux = [c for c in flagged.columns if c.startswith("__")]
    kept = (
        flagged.filter(F.col("__keep"))
        .withColumn(text_col, F.col("__cleaned"))
        .drop(*aux)
    )
    removed = flagged.filter(~F.col("__keep")).select(
        F.col(id_col), F.col("__page_reasons").alias("page_reasons")
    )
    return C4Result(kept=kept, removed=removed)
