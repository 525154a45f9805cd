"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming surface stops at watermark batch increments
(ST1-ST5, SURVEY.md §2.9); arbitrary stateful processing is the missing
top tier, and it is exactly what a training-data ingest needs for
"lifetime" accumulators (per-user counters, rolling quotas, dedup
budgets) that must survive across micro-batches.

``running_totals`` keeps one tiny state row per key — cumulative event
count and value sum — and emits the updated totals every micro-batch the
key appears in.  State lives in Spark's state store (checkpointed,
recoverable); memory is O(active keys), not O(events).  Pair with a
MERGE sink (``jobs.write_stream_to_table``) keyed on the group key so the
table always holds the latest running totals.

This is the one streaming operator family that genuinely needs Python
state hooks — everything else in ``streaming/jobs.py`` stays in built-in
Catalyst operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cumulative per-key (count, sum) across micro-batches."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
