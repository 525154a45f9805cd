"""PII redaction for training corpora (zero-UDF).

Any corpus destined for model training gets scrubbed of emails, phone
numbers, government ids, card numbers, and bare IPs before anything else
touches it (the reference's claims domain makes the stakes explicit —
``silver/silver_rx_claims_load.py`` carries member ids end to end; a
text corpus leaks the same identifiers free-form).  This operator is the
standard regex pass over the ``documents`` table, expressed entirely in
JVM-side ``regexp_replace`` / ``regexp_count`` so it whole-stage-codegens
into the same single projection as the rest of the text pipeline.

Design points:

- **One projection, no shuffle**: rules chain inside a single ``select``;
  Catalyst collapses the chain, so a 100 TB scrub is a pure map over the
  scan with cost linear in bytes, pipelined with any downstream filter.
- **Audit columns**: per-rule match counts (``pii_<rule>``) computed on
  the ORIGINAL text, plus ``pii_total``.  Counting before replacing
  keeps the audit independent of rule order; a document with
  ``pii_total = 0`` provably round-trips byte-identical.
- **Rule order matters for the rewrite**: longer/stricter patterns run
  first (card before phone, ssn before phone) so a 16-digit card number
  is not half-eaten by the looser phone pattern.
- **Replacement tokens** are greppable sentinels (``<EMAIL>`` etc.), the
  convention both C4 and The Pile's scrubbers used, so downstream
  tokenizer work can count or strip them.

The patterns are deliberately high-precision/recall-balanced regexes —
the scale path for higher-recall NER-style scrubbing is the same
projection with the regex swapped for a model scored via the multimodal
``mapInPandas`` plumbing (``operators/multimodal.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RedactionRule:
    name: str
    pattern: str  # Java regex (runs JVM-side)
    token: str


# Order is the REWRITE order: most-specific first so a broad pattern
# never consumes half of a narrower match's span.
DEFAULT_RULES: tuple[RedactionRule, ...] = (
    RedactionRule(
        "email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    ),
    RedactionRule(
        "card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CARD>"
    ),
    RedactionRule("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    RedactionRule(
        "ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"
    ),
    RedactionRule(
        "phone",
        r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}\b",
        "<PHONE>",
    ),
)


def _redacted(text: Column, rules: tuple[RedactionRule, ...]) -> Column:
    out = text
    for r in rules:
        out = F.regexp_replace(out, r.pattern, r.token)
    return out


def redact(
    df: DataFrame,
    text_col: str = "text",
    rules: tuple[RedactionRule, ...] = DEFAULT_RULES,
    audit: bool = True,
) -> DataFrame:
    """Replace ``text_col`` with its redacted form.  With ``audit``,
    append per-rule match counts ``pii_<name>`` (counted on the original
    text — order-independent) and ``pii_total``.  All other columns pass
    through untouched."""
    txt = F.col(text_col)
    cols = [c for c in df.columns if c != text_col]
    proj = [*cols, _redacted(txt, rules).alias(text_col)]
    if audit:
        counts = [
            F.regexp_count(txt, F.lit(r.pattern)).alias(f"pii_{r.name}")
            for r in rules
        ]
        total = sum(
            (F.regexp_count(txt, F.lit(r.pattern)) for r in rules), F.lit(0)
        ).alias("pii_total")
        proj = [*proj, *counts, total]
    return df.select(*proj)
