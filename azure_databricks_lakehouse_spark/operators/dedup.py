"""Keep-latest-per-key deduplication (ranking-window dedup).

Generalizes the reference's dedup-to-latest (W1/A6:
``row_number() over partitionBy(claim_id) orderBy(received_date DESC,
ingestion_timestamp DESC)`` then keep rn==1,
``silver/silver_rx_claims_load.py:159-179``) to arbitrary keys and
tiebreakers.

Scale notes: the window forces exactly one hash-shuffle on the key — the
minimum possible for exact dedup.  For skewed keys AQE's skew handling does
not apply to windows, so callers with a known hot key should pre-salt; for
the common "latest by timestamp" case ``max_by`` aggregation (also provided)
does a partial map-side reduction and shuffles only one row per key per
input partition — strictly less shuffle IO than the window at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "_dedup_rn",
) -> DataFrame:
    """Exactly one row per key: first under ``order_by`` (pass descending
    columns for latest-wins).  Tiebreakers should make the order total —
    the reference uses (received_date DESC, ingestion_timestamp DESC)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def keep_latest_salted(
    df: DataFrame,
    keys: Sequence[str],
    order_by_cols: Sequence[str],
    descending: bool = True,
    salt_mod: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-resistant exact dedup: two bounded shuffles instead of one hot
    one.

    A single window shuffle sends *every* row of a hot key to one task —
    AQE's skew splitting does not apply to windows, so one pathological
    key (the classic null/default-id skew) serializes the stage.  Here
    rows first dedup within (keys, salt) — salt derived deterministically
    from ``salt_src`` (default: the first order column), so the reduction
    is reproducible — leaving at most ``salt_mod`` candidates per key,
    then a second, trivially small window picks the global winner.

    Equivalent to :func:`keep_latest` ordered by ``order_by_cols``
    (all descending or all ascending); total order required for
    determinism, as ever.
    """
    cols = [F.col(c) for c in order_by_cols]
    order = [c.desc() for c in cols] if descending else [c.asc() for c in cols]
    salt = F.pmod(
        F.xxhash64(F.col(salt_src or order_by_cols[0])), F.lit(salt_mod)
    ).alias("_dedup_salt")
    within = keep_latest(
        df.withColumn("_dedup_salt", salt),
        [*keys, "_dedup_salt"],
        order,
    )
    return keep_latest(within, keys, order).drop("_dedup_salt")


def latest_by(
    df: DataFrame, keys: Sequence[str], ts_col: str, payload_cols: Sequence[str]
) -> DataFrame:
    """Shuffle-lean alternative: ``max_by(struct(payload), ts)`` per key.

    Partial-aggregates map-side (one candidate row per key per partition
    crosses the wire) — preferred at very large scale when the full row
    can be reconstructed from ``payload_cols``.  Ties on ``ts_col`` are
    broken arbitrarily; use :func:`keep_latest` when a total order matters.
    Key columns are excluded from the packed payload so the unpacked
    result never carries duplicate columns.
    """
    packed = F.struct(*[F.col(c) for c in payload_cols if c not in set(keys)])
    agg = df.groupBy(*keys).agg(F.max_by(packed, F.col(ts_col)).alias("_latest"))
    return agg.select(*keys, "_latest.*")
