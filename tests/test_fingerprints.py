"""Winnowing operator tests: the MOSS guarantee (shared substring of
length >= k+w-1 shares a fingerprint) must hold under BOTH hash backends,
and both backends must flag the same overlapping pairs — identical
sketch semantics, different hash constants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.fingerprints import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
    winnow_fingerprints_long,
)

_SHARED = "the quick brown fox jumps over the lazy dog"


def _corpus(spark):
    rows = [
        (1, f"alpha beta {_SHARED} gamma delta"),
        (2, f"zzz completely different prefix {_SHARED}"),
        (3, "nothing in common with anything else here at all"),
        (4, "tiny"),  # shorter than k+w-1: no fingerprint possible
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.mark.parametrize("backend", ["xxh", "poly"])
def test_winnow_guarantee_shared_substring(spark, backend):
    fps = winnow_fingerprints(_corpus(spark), k=8, w=4, hash=backend)
    rows = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
    assert 4 not in rows  # too short to carry a window
    # docs 1 and 2 share a 43-char substring >> k+w-1=11: guaranteed overlap
    assert rows[1] & rows[2]
    # winnowing density: every doc emits fewer fingerprints than k-grams
    counts = {r["doc_id"]: (r["n_kgrams"], len(r["fingerprints"]))
              for r in fps.collect()}
    for n_kgrams, n_fps in counts.values():
        assert 0 < n_fps <= n_kgrams


def test_backends_agree_on_overlap_pairs(spark):
    df = _corpus(spark)

    def pairs(backend):
        flat = winnow_fingerprints_long(df, k=8, w=4, hash=backend)
        return {
            (r["doc_a"], r["doc_b"])
            for r in fingerprint_overlap_pairs(flat, min_shared=2).collect()
        }

    assert pairs("xxh") == pairs("poly") == {(1, 2)}


def test_long_and_array_variants_agree(spark):
    df = _corpus(spark)
    from pyspark.sql import functions as F2

    arr = {
        (r["doc_id"], fp)
        for r in winnow_fingerprints(df, k=8, w=4, hash="poly").collect()
        for fp in r["fingerprints"]
    }
    long = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints_long(df, k=8, w=4, hash="poly").collect()
    }
    assert arr == long


def test_unknown_backend_rejected(spark):
    with pytest.raises(ValueError, match="unknown hash backend"):
        winnow_fingerprints(_corpus(spark), hash="sha9000")


def test_max_len_bounds_multi_megabyte_doc(spark):
    """Round-3 verdict item 7: a multi-MB document must not materialize a
    multi-million-element hash array in one row — max_len truncates to
    the fingerprinted head and the job completes with bounded arrays."""
    import pytest

    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        winnow_fingerprints,
        winnow_fingerprints_long,
    )

    big = "abcdefgh" * (3 * 1024 * 1024 // 8)  # ~3 MB, repetitive
    df = spark.createDataFrame([(1, big), (2, "abcdefghijk")], "doc_id int, text string")

    capped = winnow_fingerprints(df, max_len=4096).collect()
    by_id = {r["doc_id"]: r for r in capped}
    # k-gram count is bounded by the cap, not the document length
    assert by_id[1]["n_kgrams"] == 4096 - 7
    assert by_id[2]["n_kgrams"] == 4
    # truncation is a PREFIX: the short doc's fingerprints are unchanged
    uncapped_short = {
        tuple(r["fingerprints"])
        for r in winnow_fingerprints(df.filter("doc_id = 2")).collect()
    }
    assert {tuple(by_id[2]["fingerprints"])} == uncapped_short

    # long format honors the same cap
    n_long = winnow_fingerprints_long(df, max_len=4096).count()
    assert 0 < n_long <= 4096

    with pytest.raises(ValueError, match="below one window"):
        winnow_fingerprints(df, max_len=5)


# -- decontamination ---------------------------------------------------------


def test_decontaminate_catches_quoted_benchmark(spark):
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously")],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes the benchmark question inside a larger page
            (1, "trivia dump: what is the capital of france paris obviously end"),
            # clean document, same vocabulary but no k+w-1 verbatim run
            (2, "paris is a capital; france is a country; what of it"),
            (3, "entirely unrelated text about databases and spark"),
        ],
        "doc_id int, text string",
    )
    clean, dirty = decontaminate(corpus, bench, k=8, w=4, min_shared=2)
    assert sorted(r["doc_id"] for r in dirty.collect()) == [1]
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]
    # original columns survive on both sides; evidence column on dirty
    assert set(clean.columns) == {"doc_id", "text"}
    [d] = dirty.collect()
    assert d["n_hits"] >= 2


def test_decontaminate_partitions_corpus_exactly(spark):
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        decontaminate,
    )

    corpus = _corpus(spark)
    # NB: first attempt used "no overlap with anything zzzz" — and the
    # detector correctly flagged corpus doc 3 ("...common with anything
    # else..."): a real 14-char verbatim run. Disjoint alphabet instead.
    bench = spark.createDataFrame(
        [(999, "qqqq xqxqxqxqxqxqxq qqqq")], "doc_id int, text string"
    )
    clean, dirty = decontaminate(corpus, bench)
    assert dirty.count() == 0
    assert clean.count() == corpus.count()


def test_decontaminate_benchmark_side_is_broadcast(spark):
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        decontaminate,
    )

    corpus = _corpus(spark)
    bench = spark.createDataFrame(
        [(999, "abcdefghijklmnop")], "doc_id int, text string"
    )
    _clean, dirty = decontaminate(corpus, bench)
    plan = dirty._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- incremental dedup against a persisted index ---------------------------
def _index_corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "pack my box with five dozen liquor jugs before the storm arrives"),
        (3, "a completely different document about distributed query engines"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_dedup_batch_against_index(spark):
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        dedup_batch_against_index,
    )

    corpus = _index_corpus(spark)
    index = winnow_fingerprints_long(corpus, cluster_by_fp=True)
    batch = spark.createDataFrame(
        [
            # exact copy of doc 1 -> containment 1.0
            (101, "the quick brown fox jumps over the lazy dog near the river bank"),
            # quotes half of doc 2, half fresh -> mid containment
            (102, "pack my box with five dozen liquor jugs and entirely novel tail content here"),
            # fresh
            (103, "photosynthesis converts carbon dioxide into oxygen and sugar"),
            # too short to fingerprint (< k+w-1)
            (104, "tiny"),
        ],
        "doc_id int, text string",
    )
    kept, rejected, new_rows = dedup_batch_against_index(
        batch, index, min_containment=0.5
    )
    rej = {r["doc_id"]: r for r in rejected.collect()}
    assert 101 in rej and rej[101]["containment"] == 1.0 and rej[101]["match_id"] == 1
    assert set(r["doc_id"] for r in kept.collect()) == {103, 104} | (
        set() if 102 in rej else {102}
    )
    # fresh doc's fingerprints are staged for the index append; rejected ids never are
    staged = set(r["doc_id"] for r in new_rows.collect())
    assert 103 in staged and 101 not in staged and 104 not in staged

    # incremental property: after appending, a copy of doc 103 is caught
    index2 = index.unionByName(new_rows)
    _, rejected2, _ = dedup_batch_against_index(
        spark.createDataFrame(
            [(201, "photosynthesis converts carbon dioxide into oxygen and sugar")],
            "doc_id int, text string",
        ),
        index2,
        min_containment=0.5,
    )
    r2 = rejected2.collect()
    assert len(r2) == 1 and r2[0]["match_id"] == 103 and r2[0]["containment"] == 1.0


def test_dedup_batch_plan_broadcasts_batch_side(spark):
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        dedup_batch_against_index,
    )
    from azure_databricks_lakehouse_spark.plans import (
        assert_no_cartesian,
        physical_plan,
    )

    corpus = _index_corpus(spark)
    index = winnow_fingerprints_long(corpus, cluster_by_fp=True)
    batch = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id int, text string",
    )
    _, rejected, _ = dedup_batch_against_index(batch, index)
    plan = physical_plan(rejected)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(rejected)


def test_decontaminate_fp_freq_cull_on_templated_corpus(spark):
    """On a boilerplate-heavy corpus, the benchmark's common k-grams hit
    every document; the frequency cull must keep decontamination scoped
    to documents sharing RARE fingerprints (true quotes)."""
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        decontaminate,
    )

    boiler = "all rights reserved contact us terms of service privacy policy "
    rows = [(i, boiler + f"page number {i} of the catalog") for i in range(40)]
    # doc 40 quotes the benchmark question verbatim inside the boilerplate
    rows.append((40, boiler + "what is the capital of ancient elbonia exactly"))
    corpus = spark.createDataFrame(rows, "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, boiler + "what is the capital of ancient elbonia exactly")],
        "doc_id int, text string",
    )
    # without the cull: the shared boilerplate contaminates everything
    clean0, bad0 = decontaminate(corpus, bench, min_shared=2)
    assert clean0.count() == 0
    # with it: only the true quote-carrier is flagged
    clean1, bad1 = decontaminate(
        corpus, bench, min_shared=2, max_fp_doc_freq=20
    )
    assert {r["doc_id"] for r in bad1.collect()} == {40}
    assert clean1.count() == 40
    # the scale-free fraction cap resolves to the same verdict
    clean2, bad2 = decontaminate(
        corpus, bench, min_shared=2, max_fp_doc_frac=0.5
    )
    assert {r["doc_id"] for r in bad2.collect()} == {40}
    assert clean2.count() == 40


def test_materialized_fp_table_feeds_overlap_identically(spark, tmp_path):
    """The stored fingerprint table (production artifact) must drive
    fingerprint_overlap_pairs to the exact same pairs as the inline
    frame, and re-materializing overwrites in place (same handle)."""
    from azure_databricks_lakehouse_spark.operators.fingerprints import (
        fingerprint_overlap_pairs,
        materialize_fingerprint_table,
        winnow_fingerprints_long,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"document {i} body " + base[: 20 + i]) for i in range(10)]
    rows.append((10, rows[3][1]))  # exact copy of doc 3 -> containment 1
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    root = str(tmp_path / "fps")
    tbl = materialize_fingerprint_table(docs, root, k=5, w=3)
    from_table = fingerprint_overlap_pairs(
        tbl.read(), min_shared=2, min_containment=0.8
    )
    inline = fingerprint_overlap_pairs(
        winnow_fingerprints_long(docs, k=5, w=3),
        min_shared=2,
        min_containment=0.8,
    )
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    got = sorted(from_table.collect(), key=key)
    want = sorted(inline.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any(r["doc_a"] == 3 and r["doc_b"] == 10 for r in got)
    # overwrite path: second materialization lands as a new version
    v0 = tbl.latest_version()
    materialize_fingerprint_table(docs, root, k=5, w=3)
    assert tbl.latest_version() > v0
