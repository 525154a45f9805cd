"""Corpus-wide duplicate-LINE removal (CCNet / RefinedWeb boilerplate
stripping), zero-UDF.

Whole-document dedup (`operators/dedup`, minhash, simhash) cannot touch
the navigation bars, cookie banners, and footer text repeated across
MILLIONS of otherwise-distinct pages — the single largest source of
cross-document repetition in web corpora.  The CCNet recipe removes any
LINE whose normalized form repeats at least ``min_count`` times across
the corpus, then reassembles each document from its surviving lines in
order.

Spark-first shape:

- explode documents into ``(doc, position, line)`` via ``posexplode``
  (map-side, no shuffle);
- one hash aggregate over normalized line keys → the repeated-line set
  (map-side partial counts mean wire volume is distinct-lines per
  partition, not the line stream);
- a LEFT ANTI join drops offending lines.  The boilerplate side is
  pre-filtered to ``count >= min_count`` — the head-heavy tail of web
  boilerplate is a small fraction of distinct lines, so AQE usually
  broadcasts it; when it doesn't fit, the anti-join degrades to a
  co-partitioned shuffle on the line key, never a cartesian
  (plan-asserted in tests);
- reassembly is ``sort_array(collect_list(struct(pos, line)))`` per
  document — grouped by doc id, state bounded by that document's own
  line count.

Short lines (below ``min_line_chars``) are never removed: "Yes." or a
lone closing brace repeats legitimately, and stripping it would corrupt
prose and code alike — the knob CCNet exposes for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _line_key(line):
    """Normalized identity of a line: case/whitespace-insensitive."""
    return F.md5(F.regexp_replace(F.trim(F.lower(line)), r"\s+", " "))


def repeated_lines(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 2,
    min_line_chars: int = 10,
) -> DataFrame:
    """``(line_key, n_occurrences)`` for every eligible line repeating
    at least ``min_count`` times corpus-wide — the boilerplate set."""
    lines = docs.select(
        F.explode(F.split(F.col(text_col), r"\n")).alias("__line")
    ).filter(F.length(F.trim(F.col("__line"))) >= min_line_chars)
    return (
        lines.groupBy(_line_key(F.col("__line")).alias("line_key"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def remove_duplicate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 2,
    min_line_chars: int = 10,
    boiler: DataFrame | None = None,
) -> DataFrame:
    """Documents with corpus-repeated lines stripped: the input columns
    with ``text_col`` rebuilt from surviving lines (original order and
    line breaks preserved) plus ``n_lines_removed``.  Documents whose
    lines all survive pass through byte-identical.

    ``boiler`` short-circuits the internal :func:`repeated_lines` pass
    with a caller-held ``(line_key, n_occurrences)`` frame (it must
    come from the same docs/thresholds) — a caller that also reports
    the boilerplate set can explode the corpus lines once and share
    the materialized frame with both consumers."""
    if boiler is None:
        boiler = repeated_lines(
            docs, text_col, min_count=min_count,
            min_line_chars=min_line_chars,
        )
    other_cols = [c for c in docs.columns if c != text_col]
    lines = docs.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("__pos", "__line"),
    )
    eligible = F.length(F.trim(F.col("__line"))) >= min_line_chars
    keyed = lines.withColumn(
        "__key", F.when(eligible, _line_key(F.col("__line")))
    )
    # anti-join on the normalized key: short lines carry a NULL key and
    # can never match (NULL never equals), so they always survive
    survivors = keyed.join(
        boiler, keyed["__key"] == boiler["line_key"], "left_anti"
    )
    n_lines = docs.select(
        id_col, F.size(F.split(F.col(text_col), r"\n")).alias("__n_total")
    )
    rebuilt = (
        survivors.groupBy(*other_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("__n_kept"),
        )
    )
    return (
        rebuilt.join(n_lines, id_col)
        .select(
            *other_cols,
            text_col,
            (F.col("__n_total") - F.col("__n_kept")).alias("n_lines_removed"),
        )
    )
