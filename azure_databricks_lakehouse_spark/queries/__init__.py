"""Oracle-checked query corpus (the engine's sqllogictest equivalent).

Each submodule exposes ``QUERIES: dict[str, QuerySpec]``; a ``QuerySpec``
pairs a DataFrame-building callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops that SQL
cannot express — the driver then records a weaker rows-only check).

``__spark_entry__.py`` at the repo root aggregates these into the driver
contract (``queries()`` / ``oracle_sql()``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def all_queries() -> dict[str, QuerySpec]:
    from azure_databricks_lakehouse_spark.queries import (
        advanced_ops,
        claims_dq,
        dedup_ops,
        events_ops,
        lakehouse_ops,
        relational,
        sql_surface,
        text_ops,
        vector_ops,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        claims_dq,
        lakehouse_ops,
        events_ops,
        text_ops,
        dedup_ops,
        vector_ops,
        advanced_ops,
        sql_surface,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
