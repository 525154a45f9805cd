"""Sequence packing for LLM training: concat-and-chunk manifest.

The standard GPT-style training layout concatenates every document's
tokens in a fixed order and cuts the stream every ``capacity`` tokens.
This operator computes the resulting PACKING MANIFEST declaratively: for
each document, its absolute token offset in the concatenated stream and
the range of training sequences it lands in.  Downstream, the actual
tensor materialization groups by sequence id — the manifest is the
shuffle-key plan for it.

The core is a distributed prefix sum.  A naive
``SUM(tokens) OVER (ORDER BY doc)`` funnels the whole table through ONE
task (unpartitioned window).  Instead: range-partition on the order key,
cumsum *within* each partition (parallel local windows), then add
per-partition offsets from a partition-count-sized side frame — the
classic two-phase scan, same shape as ``operators/dims.add_surrogate_key``.
One range shuffle + one broadcast join; no single-task stage anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame, value_col: str, order_col: str, out_col: str = "cumsum"
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order (each
    row's value NOT included — its starting offset), without an
    unpartitioned window."""
    ranged = df.repartitionByRange(order_col).withColumn(
        "_ps_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_ps_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_ps_local", F.coalesce(F.sum(value_col).over(local_w), F.lit(0))
    )
    offsets = (
        local.groupBy("_ps_pid")
        .agg(F.sum(value_col).alias("_ps_total"))
        .withColumn(
            "_ps_offset",
            F.coalesce(
                F.sum("_ps_total").over(
                    Window.orderBy("_ps_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_ps_pid", "_ps_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_ps_pid")
        .withColumn(out_col, (F.col("_ps_local") + F.col("_ps_offset")).cast("long"))
        .drop("_ps_pid", "_ps_local", "_ps_offset")
    )


def pack_manifest(
    df: DataFrame,
    *,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    capacity: int = 2048,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Concat-and-chunk packing manifest: per document its
    ``start_offset`` in the token stream, the first/last training
    sequence it occupies, and its offset within the first sequence.
    Documents longer than ``capacity`` simply span multiple sequences
    (that is the concat-chunk semantic — no padding, no loss).
    ``keep_cols`` pass through untouched (e.g. the document id when
    ``order_col`` is a synthetic shuffle key) — carrying them here is
    free; re-joining them later costs a corpus-wide shuffle."""
    cum = distributed_cumsum(df, token_col, order_col, out_col="start_offset")
    end = F.col("start_offset") + F.col(token_col)
    return cum.select(
        order_col,
        *keep_cols,
        token_col,
        "start_offset",
        F.floor(F.col("start_offset") / capacity).cast("long").alias("start_seq"),
        F.floor((end - 1) / capacity).cast("long").alias("end_seq"),
        (F.col("start_offset") % capacity).cast("long").alias("offset_in_seq"),
    )
