"""Property-based tests (hypothesis): algorithmic guarantees that
example-based tests can't pin down — the MOSS winnowing detection
guarantee, connected-components equivalence to a sequential union-find
oracle, packing-manifest invariants, and redaction audit consistency.

Each example runs real Spark jobs, so example counts are deliberately
small and data tiny; the point is adversarial STRUCTURE (random graphs,
random affixes, random length mixes), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_databricks_lakehouse_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from azure_databricks_lakehouse_spark.operators.fingerprints import (
    winnow_fingerprints_long,
)
from azure_databricks_lakehouse_spark.operators.packing import pack_manifest
from azure_databricks_lakehouse_spark.operators.redaction import redact

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)

_K, _W = 4, 3  # winnowing params: guarantee length = k + w - 1 = 6


@given(
    pre_a=st.text(alphabet="ab", max_size=16),
    post_a=st.text(alphabet="ab", max_size=16),
    pre_b=st.text(alphabet="ba", max_size=16),
    post_b=st.text(alphabet="ab", max_size=16),
    shared=st.text(alphabet="cdefgh", min_size=_K + _W - 1, max_size=24),
)
@settings(**_SETTINGS)
def test_winnowing_detection_guarantee(
    spark, pre_a, post_a, pre_b, post_b, shared
):
    """The winnowing theorem (Schleimer/Wilkerson/Aiken, MOSS): any exact
    match of length >= w + k - 1 leaves at least one SHARED fingerprint —
    whatever surrounds it.  A shared substring >= the guarantee length
    contains w consecutive identical k-gram hashes in both documents, so
    both window-min selections pick the same value at least once."""
    docs = spark.createDataFrame(
        [(1, pre_a + shared + post_a), (2, pre_b + shared + post_b)],
        "doc_id int, text string",
    )
    flat = winnow_fingerprints_long(docs, k=_K, w=_W)
    a = flat.filter("doc_id = 1").select("fp")
    b = flat.filter("doc_id = 2").select("fp")
    assert a.join(b, "fp").count() >= 1


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in {v for e in edges for v in e}}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=14,
    )
)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    """Both CC variants (min-label propagation and large-star/small-star)
    must agree with a sequential union-find on arbitrary small graphs —
    self-loops, parallel edges, multiple components, chains included."""
    # canonical expectation: min node id per union-find component
    expect_raw = _union_find(10, edges)
    roots: dict[int, int] = {}
    for v, r in expect_raw.items():
        roots[r] = min(roots.get(r, v), v)
    expect = {v: roots[r] for v, r in expect_raw.items()}

    df = spark.createDataFrame(edges, "src long, dst long")
    for fn in (connected_components, connected_components_star):
        got = {
            r["node"]: r["component_id"]
            for r in fn(df, max_iter=40).collect()
        }
        assert got == expect, f"{fn.__name__} diverged from union-find"


@given(
    lengths=st.lists(st.integers(1, 40), min_size=1, max_size=12),
    capacity=st.integers(4, 24),
)
@settings(**_SETTINGS)
def test_pack_manifest_invariants(spark, lengths, capacity):
    """Concat-and-chunk manifest invariants for any length mix: offsets
    are the exact prefix sum in order (gap-free, overlap-free), sequence
    spans are consistent with the offsets, and offsets stay in-bounds."""
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        pack_manifest(df, capacity=capacity).collect(),
        key=lambda r: r["doc_id"],
    )
    running = 0
    for r, n in zip(rows, lengths):
        assert r["start_offset"] == running
        assert r["start_seq"] == running // capacity
        assert r["end_seq"] == (running + n - 1) // capacity
        assert r["offset_in_seq"] == running % capacity
        assert r["end_seq"] >= r["start_seq"]
        running += n


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_redaction_audit_consistent_with_rewrite(spark, text):
    """For arbitrary printable text: pii_total == 0 iff the rewrite is a
    byte-identical round-trip — the count patterns and the replace
    patterns can never disagree."""
    [r] = redact(
        spark.createDataFrame([(0, text)], "doc_id int, text string")
    ).collect()
    if r["pii_total"] == 0:
        assert r["text"] == text
    else:
        assert r["text"] != text


# --- BPE training equivalence to the sequential reference ------------------
@given(
    words=st.lists(
        st.text(alphabet="abcde ", min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_bpe_matches_sequential_reference(spark, words, n_merges):
    """For ANY corpus, the distributed merge sequence equals the
    sequential Sennrich algorithm's (same tie-break: count desc, pair
    lexicographic asc)."""
    from azure_databricks_lakehouse_spark.operators.bpe import learn_bpe_merges
    from tests.test_bpe import _ref_learn

    texts = [" ".join(words)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got, _ = learn_bpe_merges(df, n_merges=n_merges)
    want, _ = _ref_learn(texts, n_merges)
    assert got == want
