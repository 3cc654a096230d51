"""n-gram LM perplexity scoring and exact duplicate-substring span
stats (operators/text.py round 5) — hand-computed oracles."""

from __future__ import annotations

import math

import pytest

from oxbow_spark.operators.text import dup_span_stats, ngram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, ""), (3, "c")],
        "doc_id long, text string")


def test_ngram_lm_hand_computed(spark, docs):
    """Corpus: tokens a(3) b(3) c(1), N=7, V=3; bigrams ab(2), ba(1).
    alpha=0.5 → aV=1.5."""
    got = {r.doc_id: r for r in ngram_lm_score(docs, alpha=0.5).collect()}
    a = 0.5
    N, V = 7, 3
    ca, cb_, cc = 3, 3, 1
    c_ab, c_ba = 3, 1  # 'a b' twice in doc 0 + once in doc 1

    def q(x):  # decimal(28,6) quantization of each term
        return round(x, 6)

    # doc 0: first 'a' unigram; then ab, ba, ab bigrams
    t0 = [q(-math.log((ca + a) / (N + a * V))),
          q(-math.log((c_ab + a) / (ca + a * V))),
          q(-math.log((c_ba + a) / (cb_ + a * V))),
          q(-math.log((c_ab + a) / (ca + a * V)))]
    m0 = sum(t0) / 4
    assert got[0].n_terms == 4
    assert got[0].mean_nll == pytest.approx(round(m0, 6), abs=2e-6)
    assert got[0].ppl == pytest.approx(round(math.exp(m0), 6), abs=2e-5)
    # doc 3: single token 'c' — unigram only
    m3 = q(-math.log((cc + a) / (N + a * V)))
    assert got[3].n_terms == 1
    assert got[3].mean_nll == pytest.approx(m3, abs=2e-6)
    # empty doc: row kept, null score
    assert got[2].n_terms == 0 and got[2].ppl is None
    # rarer content scores higher perplexity
    assert got[3].ppl > got[1].ppl


def test_dup_span_stats_hand_computed(spark):
    """k=2 grams; 'x y' appears in docs 0 and 1 → both marked; doc 0's
    overlapping grams 'x y','y x','x y' merge into ONE span of 4
    tokens; doc 2 has no duplicated grams."""
    df = spark.createDataFrame(
        [(0, "x y x y"), (1, "q x y r"), (2, "u v w"), (3, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_stats(df, k=2).collect()}
    # corpus gram counts: 'x y':3 (doc0 twice, doc1), 'y x':1, 'q x':1,
    # 'y r':1, 'u v':1, 'v w':1 → only 'x y' duplicated
    assert got[0].n_dup_grams == 2
    # spans [1,3) and [3,5) are bookended -> merge into one 4-token run
    assert got[0].n_dup_spans == 1
    assert got[0].dup_tokens == 4 and got[0].longest_dup_span == 4
    assert got[0].dup_token_frac == 1.0
    assert got[1].n_dup_grams == 1
    assert got[1].dup_tokens == 2 and got[1].longest_dup_span == 2
    assert got[2].n_dup_grams == 0 and got[2].dup_tokens == 0
    assert got[3].dup_tokens == 0
    assert got[2].dup_token_frac == 0.0


def test_dup_span_merging_adjacent(spark):
    """A run of duplicated overlapping grams merges into one span."""
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_stats(df, k=3).collect()}
    # every 3-gram duplicated across the two docs; spans [1,4),[2,5),[3,6)
    # merge to one [1,6) = 5 tokens
    for i in (0, 1):
        assert got[i].n_dup_spans == 1
        assert got[i].dup_tokens == 5
        assert got[i].longest_dup_span == 5
        assert got[i].dup_token_frac == 1.0
