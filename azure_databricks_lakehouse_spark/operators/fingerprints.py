"""Document fingerprinting by winnowing (the MOSS scheme).

Hash every character ``k``-gram, slide a ``w``-position window, keep each
window's minimum hash — the distinct minima are the document's
fingerprint set.  Any shared substring of length >= k+w-1 between two
documents is guaranteed to share a fingerprint, which makes this the
standard containment/plagiarism sketch (near-dup detection for *partial*
overlap, where set-Jaccard ops need full-document similarity).

Two hash backends, one semantics:

- ``hash="xxh"`` (default, production): ``xxhash64`` over each k-gram
  substring — JVM intrinsic, non-crypto, full 64-bit minima.  The 100 TB
  path: a cryptographic digest per character position is pure wasted CPU
  for a sketching job.
- ``hash="poly"``: the cross-engine Karp-Rabin fold from
  ``functions/hashing`` (base-31 Horner mod 2^16 over char codes), used
  by the oracle-compared query twin so DuckDB can verify fingerprints
  bit-for-bit.

Either way the operator is a pure projection — per-document array ops,
zero shuffle, no UDFs — so it scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.hashing import (
    char_codes,
    poly_u16,
)


def _positions(n: Column) -> Column:
    """1..n as an array, EMPTY when n < 1.  ``F.sequence(lit(1), n)`` alone
    is not total: for n <= 0 it descends ``[1, 0, ...]`` and a downstream
    ``slice(codes, 0, k)`` throws.  The eligibility filter excludes such
    rows semantically, but pushed-down predicates (e.g. explode's implicit
    ``size > 0``) and codegen subexpression elimination can evaluate the
    fingerprint expression on filtered-out rows first — every expression
    here must be safe on ANY row."""
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash: str = "xxh",
) -> DataFrame:
    """``(id_col, n_kgrams, fingerprints array<long>)`` per document with
    at least one full window (length >= k+w-1); shorter docs are dropped
    (they cannot carry a fingerprint)."""
    txt = F.col(text_col)
    eligible = df.filter(F.length(txt) >= k + w - 1)
    if hash == "xxh":
        grams = F.transform(
            _positions(F.length(txt) - (k - 1)),
            lambda i: txt.substr(i, F.lit(k)),
        )
        hashed = eligible.select(
            id_col, F.transform(grams, lambda g: F.xxhash64(g)).alias("hs")
        )
    elif hash == "poly":
        # Materialize the codes array as a named column so the per-position
        # lambda references it instead of re-deriving split+ascii per gram
        # (no common-subexpression elimination inside higher-order funcs).
        hashed = eligible.select(id_col, char_codes(txt).alias("_codes"))
        hashed = hashed.select(
            id_col,
            F.transform(
                _positions(F.size("_codes") - (k - 1)),
                lambda i: poly_u16(F.slice(F.col("_codes"), i, k)),
            ).alias("hs"),
        )
    else:
        raise ValueError(f"unknown hash backend {hash!r} (use 'xxh' or 'poly')")
    mins = F.transform(
        _positions(F.size("hs") - (w - 1)),
        lambda i: F.array_min(F.slice(F.col("hs"), i, w)),
    )
    return hashed.select(
        id_col,
        F.size("hs").alias("n_kgrams"),
        F.transform(
            F.array_sort(F.array_distinct(mins)), lambda x: x.cast("long")
        ).alias("fingerprints"),
    )


def fingerprint_overlap_pairs(
    fps: DataFrame, *, id_col: str = "doc_id", min_shared: int = 1
) -> DataFrame:
    """Candidate containment pairs: documents sharing >= ``min_shared``
    winnowing fingerprints.  Bucketed by fingerprint (explode + self
    equi-join on the hash) — candidate count is bounded by per-fingerprint
    bucket sizes, never all-pairs."""
    flat = fps.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
