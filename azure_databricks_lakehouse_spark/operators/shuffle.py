"""Deterministic global shuffle: reproducible training-data permutations.

Training runs need the corpus in pseudo-random order, and they need the
SAME order when a run is replayed (debugging a loss spike at step N
means re-reading exactly the batch the model saw).  ``ORDER BY rand()``
fails both ways — nondeterministic under retries and a single-task total
sort at scale.

The permutation here is a pure function of ``(seed, id)``:

    shuffle_key = xxhash64(seed, id)
    partition   = murmur3(shuffle_key) mod n     (Spark's hash repartition)
    order       = shuffle_key within the partition

Every step is layout-independent — the same row lands in the same
partition at the same position whether the input arrived in 3 splits or
300, on 8 executors or 800.  Reading partitions in index order yields a
deterministic permutation of the whole corpus; a new ``seed`` (epoch
number) yields a fresh, equally-deterministic permutation.  Cost is
exactly one shuffle plus a per-partition sort — no global sort, no
driver involvement, nothing data-dependent.

(The id column must uniquely identify rows — duplicate ids keep the
permutation deterministic per id-group but make the tiebreak between
identical rows meaningless, as it should be.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = "_shuffle_key"


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reproducible pseudo-random permutation of ``df`` keyed on
    ``xxhash64(seed, id_col)``; see module docstring.  ``num_partitions``
    defaults to ``spark.sql.shuffle.partitions``."""
    keyed = df.withColumn(_KEY, F.xxhash64(F.lit(seed), F.col(id_col)))
    parted = (
        keyed.repartition(num_partitions, _KEY)
        if num_partitions is not None
        else keyed.repartition(F.col(_KEY))
    )
    return parted.sortWithinPartitions(_KEY, id_col).drop(_KEY)
