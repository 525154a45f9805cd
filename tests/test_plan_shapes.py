"""Plan-shape regression tests: scale discipline pinned per headline query
— broadcasts present, filters pushed to scans, no cartesian products
anywhere in the corpus (SURVEY.md §4 discipline, judged at 100 TB)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from azure_databricks_lakehouse_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
)


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_no_cartesian_anywhere(spark, sf_dir, queries):
    for name, fn in queries.items():
        assert_no_cartesian(fn(spark, sf_dir))


def test_q01_filter_pushdown(spark, sf_dir, queries):
    df = queries["q01_pricing_summary"](spark, sf_dir)
    assert_pushed_filters(df, "LessThanOrEqual(l_shipdate")


def test_q03_broadcasts_small_dims(spark, sf_dir, queries):
    assert_broadcast_join(queries["q03_star_join_revenue"](spark, sf_dir), 2)


def test_q04_broadcasts_generated_date_dim(spark, sf_dir, queries):
    assert_broadcast_join(queries["q04_date_dim_join"](spark, sf_dir), 2)


def test_q11_global_part_uses_take_ordered(spark, sf_dir, queries):
    # the global top-k part (former q12, merged round-10) must not
    # materialize a global sort — per-partition heap + single merge
    plan = physical_plan(queries["q11_topk_per_group"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q26_topk_and_partial_agg(spark, sf_dir, queries):
    plan = physical_plan(queries["q26_token_frequency"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_q28_lsh_join_not_allpairs(spark, sf_dir, queries):
    # the candidate join must key on (band, minhash) — equi-join, and the
    # plan must contain no cartesian/unconditioned NLJ anywhere
    df = queries["q28_minhash_lsh_pairs"](spark, sf_dir)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    assert "mh" in plan and ("Join" in plan)
    assert "BroadcastNestedLoopJoin" not in plan


def test_q30_broadcasts_query_side_only(spark, sf_dir, queries):
    # brute-force cosine: query set broadcast; corpus side stays a scan.
    # Round 12 materializes each retriever's top-k list once (the union
    # and the RRF fusion both consume it), so the scoring join lives in
    # the dense subplan, not the final union plan — assert there.
    from azure_databricks_lakehouse_spark.queries.vector_ops import _dense_topk

    assert_broadcast_join(_dense_topk(spark, sf_dir), 1)


def test_q30_bm25_subplan_shape(spark, sf_dir):
    # ADVICE r12: the localCheckpoints truncate the fused q30 plan, so
    # the BM25 retriever needs its own plan-shape coverage — no
    # cartesian / unconditioned NLJ may enter the postings join
    from pyspark.sql import functions as F

    from azure_databricks_lakehouse_spark.operators.retrieval import bm25_topk
    from azure_databricks_lakehouse_spark.sources.catalog import bind

    docs = bind(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )
    queries_df = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    df = bm25_topk(docs, queries_df, k=5, exclude_self=True)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    # the only nested-loop join allowed is the 1-row broadcast stats
    # attach (crossJoin(broadcast(stats))); the postings join itself
    # must stay an equi-join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_events_scan_prunes_columns(spark, sf_dir, queries):
    plan = physical_plan(queries["q21_tumbling_window"](spark, sf_dir))
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    assert "event_id" not in scan and "props" not in scan  # unused columns pruned


def test_q51_overlap_join_keys_on_fingerprint(spark, sf_dir, queries):
    # containment candidates must come from the fp equi-join, never an
    # unconditioned pair blowup
    df = queries["q51_winnow_overlap"](spark, sf_dir)
    assert_no_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in physical_plan(df)


def test_q53_repetition_aggs_keep_partials(spark, sf_dir, queries):
    plan = physical_plan(queries["q53_gopher_repetition"](spark, sf_dir))
    assert "partial_count" in plan  # map-side combine before the gram shuffle
