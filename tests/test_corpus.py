"""Corpus-level invariants for the oracle query registry.

The driver's correctness gate checks AT MOST 50 queries (round-3 lesson:
with 55 declared, the 5 last-registered queries silently rotated out of
``CORRECTNESS_r03.json``).  Every operator must keep a green oracle row,
so the corpus is pinned at <= 50 entries — new coverage lands by merging
into an existing query (tagged unions / extra aggregate columns), not by
growing past the checked budget.
"""

from __future__ import annotations

_DRIVER_CHECK_BUDGET = 50


def test_corpus_within_driver_budget(spark):
    # imported lazily: query modules build Column expressions at import
    # time, which needs the active SparkContext the fixture provides
    from azure_databricks_lakehouse_spark.queries import all_queries

    qs = all_queries()
    assert len(qs) <= _DRIVER_CHECK_BUDGET, (
        f"{len(qs)} queries declared but the driver checks only the first "
        f"{_DRIVER_CHECK_BUDGET} — merge queries instead of exceeding the budget"
    )


def test_corpus_names_unique_and_oracle_shape(spark):
    from azure_databricks_lakehouse_spark.queries import all_queries

    qs = all_queries()
    # Names are qNN_slug, keys unique by construction; every spec either has
    # ANSI-SQL oracle text or deliberately opted out (None -> rows-only check).
    for name, spec in qs.items():
        assert name[0] == "q" and name[3] == "_", name
        assert callable(spec.fn)
        assert spec.oracle is None or "SELECT" in spec.oracle.upper()
