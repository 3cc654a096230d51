"""Distributed BPE training (operators/bpe.py) vs a brute-force Python
reference, plus segmentation determinism."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_segment_word,
    bpe_train,
    word_freqs,
)


def _py_bpe_train(word_freq: dict[str, int], n_merges: int,
                  min_pair_freq: int = 2):
    """Sennrich-style reference trainer with the same deterministic
    tie-break (count desc, pair lexicographic asc)."""
    vocab = {w: list(w) + [EOW] for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _c = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wider wide wide new"),
    (3, "low new low"),
]


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    for k in (1, 5, 12):
        got = bpe_train(df, k)
        want = _py_bpe_train(wf, k)
        assert got == want, (k, got, want)


def test_bpe_train_run_semantics(spark):
    """'aaa'-style runs must merge greedily left-to-right, matching the
    reference exactly."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aa"), (1, "aab aab")], "doc_id long, text string")
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    got = bpe_train(df, 4)
    assert got == _py_bpe_train(wf, 4)


def test_bpe_train_early_stop(spark):
    """Every word unique and single-char: no pair reaches min freq 2."""
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    assert bpe_train(df, 10) == []


def test_bpe_segment_word_rank_greedy():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", EOW): 2, ("e", "r"): 3}
    assert bpe_segment_word("low", ranks) == ["low</w>"]
    assert bpe_segment_word("lower", ranks) == ["low", "er", EOW]
    assert bpe_segment_word("x", {}) == ["x", EOW]


def test_bpe_segment_through_spark(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(df, 8)
    out = {r.doc_id: r for r in bpe_segment(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, text in CORPUS:
        toks = []
        for w in text.split():
            toks.extend(bpe_segment_word(w, ranks))
        assert out[i].n_words == len(text.split())
        assert out[i].n_bpe_tokens == len(toks)
    # determinism across runs
    again = {r.doc_id: r.tokens_digest
             for r in bpe_segment(df, merges).collect()}
    assert again == {i: r.tokens_digest for i, r in out.items()}


def test_bpe_train_on_documents_table(spark, sf_dir):
    """End-to-end on the synthetic documents corpus: deterministic
    merges, and re-training yields the identical list."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = bpe_train(df, 6)
    m2 = bpe_train(df, 6)
    assert m1 == m2 and len(m1) == 6
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    assert m1 == _py_bpe_train(wf, 6)
