"""Shared text normalization.

BPE training/tokenization, exact dedup, token counting and quality
scoring must all see the SAME normalized text — a divergent copy of the
expression in any one of them silently breaks vocab lookups, dedup
digests, or packing token counts.  One definition, imported everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column | str) -> Column:
    """Lowercase, trim, collapse whitespace runs to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
