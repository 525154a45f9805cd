"""Distributed BPE vocabulary induction vs an independent pure-Python
reference (Sennrich et al. 2016's algorithm reimplemented from the paper:
get_stats + merge_vocab over a word-frequency dict)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.bpe import (
    _PRETOKEN_RE,
    learn_bpe_merges,
    tokenize_with_vocab,
    word_frequency_table,
)
from azure_databricks_lakehouse_spark.sources.catalog import load_table


# --- reference implementation (paper's pseudocode, no shared code) ---------
def _ref_pretokenize(text: str) -> list[str]:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    return re.findall(_PRETOKEN_RE, norm)


def _ref_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(_ref_pretokenize(t))
    return c


def _ref_learn(texts: list[str], n_merges: int, min_pair_count: int = 2):
    freqs = {tuple(w): n for w, n in _ref_word_freqs(texts).items()}
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for word, n in freqs.items():
            for i in range(len(word) - 1):
                stats[(word[i], word[i + 1])] += n
        if not stats:
            break
        # deterministic tie-break: count desc, then pair lexicographic asc
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        out = {}
        for word, n in freqs.items():
            sym: list[str] = []
            for x in word:
                if sym and sym[-1] == a and x == b:
                    sym[-1] = a + b
                else:
                    sym.append(x)
            out[tuple(sym)] = out.get(tuple(sym), 0) + n
        freqs = out
    return merges, freqs


_TEXTS = [
    "the cat sat on the mat",
    "the bat and the cat chatted",
    "that hat is the cat's hat",
    "lower lowest low newer newest new",
    "wider widest wide",
    "the the the then there these",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string")


def test_word_frequency_table_matches_reference(spark, corpus):
    got = {
        r["word"]: r["count"]
        for r in word_frequency_table(corpus).collect()
    }
    assert got == dict(_ref_word_freqs(_TEXTS))


def test_learned_merges_match_reference(spark, corpus):
    merges, vocab = learn_bpe_merges(corpus, n_merges=25)
    ref_merges, ref_freqs = _ref_learn(_TEXTS, 25)
    assert merges == ref_merges
    # the segmented vocab after all merges must agree symbol-for-symbol
    got = {
        r["word"]: (tuple(r["pieces"]), r["count"]) for r in vocab.collect()
    }
    want = {"".join(w): (w, n) for w, n in ref_freqs.items()}
    assert got == {k: v for k, v in want.items()}


def test_min_pair_count_stops_early(spark):
    # every pair occurs exactly once -> nothing reaches min_pair_count=2
    df = spark.createDataFrame([(0, "abc xyz")], "doc_id int, text string")
    merges, _ = learn_bpe_merges(df, n_merges=10, min_pair_count=2)
    assert merges == []


def test_tokenize_round_trips_words(spark, corpus):
    merges, vocab = learn_bpe_merges(corpus, n_merges=15)
    toks = tokenize_with_vocab(corpus, vocab)
    rebuilt = (
        toks.orderBy("doc_id", "word_pos", "piece_pos")
        .groupBy("doc_id", "word_pos")
        .agg(F.concat_ws("", F.collect_list("token")).alias("word"))
    )
    got = {
        (r["doc_id"], r["word_pos"]): r["word"] for r in rebuilt.collect()
    }
    for i, t in enumerate(_TEXTS):
        for j, w in enumerate(_ref_pretokenize(t)):
            assert got[(i, j)] == w


def test_tokenize_oov_falls_back_to_chars(spark, corpus):
    _, vocab = learn_bpe_merges(corpus, n_merges=15)
    unseen = spark.createDataFrame([(99, "zyxw")], "doc_id int, text string")
    toks = tokenize_with_vocab(unseen, vocab).orderBy("piece_pos").collect()
    assert [r["token"] for r in toks] == ["z", "y", "x", "w"]


def test_learn_on_real_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges, vocab = learn_bpe_merges(docs, n_merges=8)
    assert len(merges) == 8
    # merged symbols grow beyond single characters
    longest = vocab.select(
        F.max(F.array_max(F.transform("pieces", F.length))).alias("m")
    ).first()["m"]
    assert longest >= 2
