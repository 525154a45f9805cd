"""Incremental distinct counting with mergeable HLL sketches.

``COUNT(DISTINCT x)`` over a 100 TB fact table re-shuffles every value
every time someone asks — and can never be served incrementally, because
distinct counts don't add across partitions.  The lakehouse answer is to
materialize a **sketch table**: one Datasketches HyperLogLog sketch per
(grouping, partition-unit) row, built once per ingested slice, then any
rollup over any subset of slices is a cheap ``hll_union_agg`` +
``hll_sketch_estimate`` over metadata-sized sketch blobs.  Spark 4 ships
the sketch algebra as JVM builtins (``hll_sketch_agg`` /
``hll_union_agg``), so the whole path stays codegen-side; DuckDB-era
``approx_count_distinct`` (q38) answers one query — this answers a
family of them incrementally.

Scale shape:

- Building sketches is ONE hash aggregate over the slice being ingested
  (map-side partial sketches merge in the exchange — the same partial
  aggregation any sum gets).  Cost ∝ new data only.
- A sketch row is ~4 KB at lgConfigK=12 regardless of how many distinct
  values it summarizes; a year of daily × 100-group sketches is
  ~150 MB — broadcast-trivial, and rollups read only it.
- Rollups never touch the fact table: estimate(any OR of slices) =
  union of their sketches.  Relative error ≈ 1.04/√2^lgConfigK
  (~1.6% at the default 12).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_LGK = 12


def build_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    lg_config_k: int = _DEFAULT_LGK,
) -> DataFrame:
    """``(group_cols..., sketch binary)`` — one HLL sketch of
    ``value_col``'s distinct values per group.  Append the result for
    each ingested slice (e.g. group by ``ingestion_date``) to the sketch
    table; never rebuild history."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch")
    )


def merge_sketches(
    sketch_df: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Roll sketches up to ``group_cols`` (empty = one global row):
    ``(group_cols..., n_distinct)``.  Runs over the sketch table only —
    the fact table is never read."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct")
    if group_cols:
        return sketch_df.groupBy(*group_cols).agg(agg)
    return sketch_df.agg(agg)
