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


def test_bpe_driver_equals_distributed(spark):
    """The default driver-local trainer and the distributed fallback
    must learn the identical merge list."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for k in (1, 5, 12):
        assert (bpe_train(df, k, strategy="driver")
                == bpe_train(df, k, strategy="distributed"))


def test_bpe_adversarial_symbols(spark):
    """Backslash / quote / mixed corpus words must train identically on
    both strategies and match the brute-force reference — the SQL-splice
    escaping gap flagged in round 5 (a winning pair containing a
    backslash used to corrupt the Catalyst fold literal)."""
    corpus = [
        (0, r"a\b a\b a\b C:\tmp\x C:\tmp\x"),
        (1, r"it's it's don't don't \\'\\' \\'\\'"),
        (2, r"a\b C:\tmp\x it's \n\n \n\n"),
        (3, "normal words normal words"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    assert any("\\" in w for w in wf) and any("'" in w for w in wf)
    for k in (3, 10):
        want = _py_bpe_train(wf, k)
        assert any("\\" in a + b or "'" in a + b for a, b in want)
        assert bpe_train(df, k, strategy="driver") == want
        assert bpe_train(df, k, strategy="distributed") == want


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bpe_property_random_corpora(spark, seed):
    """Randomized corpora (including runs, repeated chars, quotes and
    backslashes) — driver trainer ≡ brute-force reference."""
    import random

    rng = random.Random(seed)
    alphabet = "ab'\\cd"
    docs = []
    for i in range(12):
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(rng.randint(1, 10))]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    k = rng.randint(1, 15)
    assert bpe_train(df, k, strategy="driver") == _py_bpe_train(wf, k)


def test_bpe_max_vocab_words_bound(spark):
    """Truncation keeps only the top-K words by (freq DESC, word ASC):
    training then equals the brute-force reference on that sub-vocab."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_freqs(df).collect()}
    top3 = dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    assert (bpe_train(df, 5, max_vocab_words=3)
            == _py_bpe_train(top3, 5))


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
