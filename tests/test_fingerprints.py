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
