"""Sliding-window document chunking, zero-UDF.

The context-window prep step between cleaning and embedding/eval in a
training or retrieval pipeline: split each document into overlapping
token windows of ``chunk_tokens`` at ``stride`` (stride < chunk gives
overlap, so no span longer than ``chunk_tokens - stride`` is ever cut
away from all context).  Complements `operators/packing` (which
concatenates SHORT docs into fixed sequences); chunking splits LONG
docs into model-sized pieces.

Spark-first shape — one projection, one explode, ZERO shuffle:

- token array via ``split`` (whitespace; swap in a tokenizer upstream
  if token fidelity matters — the windowing algebra is identical);
- window starts via ``sequence(0, n-1, stride)`` (empty docs produce
  no chunks by construction);
- each chunk is ``slice`` + ``array_join`` back to text, tagged with
  ``chunk_id`` / ``start_token`` / ``n_chunk_tokens``.

Cost is map-side work ∝ OUTPUT size, linear in input splits at any
scale; plan-asserted shuffle-free in tests/test_chunking.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_tokens: int = 512,
    stride: int | None = None,
    keep_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """``(id_col, *keep_cols, chunk_id, start_token, n_chunk_tokens,
    chunk_text)`` — one row per sliding window.  ``stride`` defaults to
    ``chunk_tokens`` (no overlap); ``stride < chunk_tokens`` overlaps
    adjacent chunks by the difference.  The final chunk may be shorter;
    a document shorter than ``chunk_tokens`` yields exactly one chunk;
    an empty document yields none.  ``keep_cols`` are carried through
    unchanged (replicated onto every window of their document)."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError("stride must be in [1, chunk_tokens]")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # trim+split yields [""] for empty text: normalize to a true empty
    # array so empty docs produce zero windows
    toks = F.when(F.length(F.trim(F.col(text_col))) == 0, F.array()).otherwise(
        toks
    )
    # materialize tokens BEFORE the start-filter lambda: expressions
    # inside a higher-order-function lambda body are re-evaluated per
    # element, so referencing size(split(...)) there re-tokenizes the
    # document once per window — O(len²/stride) per doc
    base = docs.select(id_col, *keep_cols, toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array()
    )
    # drop trailing windows fully covered by their predecessor (a start
    # whose chunk adds no token past the previous window's end) — the
    # standard sliding-window termination
    starts = F.filter(
        starts,
        lambda s: (s == 0) | (s - stride + chunk_tokens < n),
    )
    out = base.select(
        id_col,
        *keep_cols,
        n.alias("__n"),
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    n_chunk = F.least(F.lit(chunk_tokens), F.col("__n") - F.col("start_token"))
    return out.select(
        id_col,
        *keep_cols,
        "chunk_id",
        "start_token",
        n_chunk.alias("n_chunk_tokens"),
        F.array_join(
            # slice() is 1-based on the start position
            F.slice(F.col("__toks"), F.col("start_token") + 1, n_chunk),
            " ",
        ).alias("chunk_text"),
    )
