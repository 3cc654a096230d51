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


# ------------------------------------------------------ property tests

import math as _math

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["aa", "bb", "cc", "dd", "e"]


def _py_lm(corpus, alpha=0.5):
    """Brute-force bigram-LM reference mirroring ngram_lm_score
    (including the DECIMAL(28,6) per-term quantization)."""
    toks = {i: t.split() for i, t in corpus}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    N = sum(uni.values())
    V = len(uni)
    out = {}
    for i, t in toks.items():
        if not t:
            out[i] = (0, None, None)
            continue
        terms = [round(-_math.log((uni[t[0]] + alpha) / (N + alpha * V)), 6)]
        for a, b in zip(t, t[1:]):
            terms.append(round(-_math.log(
                (big[(a, b)] + alpha) / (uni[a] + alpha * V)), 6))
        m = sum(terms) / len(terms)
        out[i] = (len(terms), round(m, 6), round(_math.exp(m), 6))
    return out


@given(st.lists(st.lists(st.sampled_from(_WORDS), max_size=12),
                min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_ngram_lm_matches_python_reference(docs_tokens):
    spark = test_ngram_lm_matches_python_reference._spark
    corpus = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_terms, r.mean_nll, r.ppl)
           for r in ngram_lm_score(df, alpha=0.5).collect()}
    want = _py_lm(corpus)
    for i, (n, m, p) in want.items():
        gn, gm, gp = got[i]
        assert gn == n
        if m is None:
            assert gm is None and gp is None
        else:
            assert gm == pytest.approx(m, abs=2e-6)
            assert gp == pytest.approx(p, rel=1e-5)


def _py_dup_spans(corpus, k):
    toks = {i: t.split() for i, t in corpus}
    cnt: dict[str, int] = {}
    for t in toks.values():
        for j in range(len(t) - k + 1):
            g = " ".join(t[j:j + k])
            cnt[g] = cnt.get(g, 0) + 1
    out = {}
    for i, t in toks.items():
        pos = [j for j in range(len(t) - k + 1)
               if cnt[" ".join(t[j:j + k])] > 1]
        covered = set()
        for j in pos:
            covered.update(range(j, j + k))
        # merged runs over covered positions
        runs = []
        for p in sorted(covered):
            if runs and p == runs[-1][1]:
                runs[-1][1] = p + 1
            else:
                runs.append([p, p + 1])
        dup = sum(b - a for a, b in runs)
        out[i] = (len(pos), len(runs), dup,
                  max((b - a for a, b in runs), default=0),
                  dup / max(len(t), 1))
    return out


@given(st.lists(st.lists(st.sampled_from(_WORDS), max_size=14),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=10, deadline=None)
def test_dup_spans_match_python_reference(docs_tokens, k):
    spark = test_dup_spans_match_python_reference._spark
    corpus = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_dup_grams, r.n_dup_spans, r.dup_tokens,
                      r.longest_dup_span, r.dup_token_frac)
           for r in dup_span_stats(df, k=k).collect()}
    want = _py_dup_spans(corpus, k)
    for i, w in want.items():
        g = got[i]
        assert g[:4] == w[:4], (i, g, w)
        assert g[4] == pytest.approx(w[4])


def _py_lm3(corpus, alpha=0.5, lambdas=(0.1, 0.3, 0.6)):
    """Brute-force interpolated-trigram reference mirroring
    ngram_lm_score(order=3): token1 unigram, token2 renormalized
    (l1,l2) bigram mix, tokens>=3 the full mix; trigram contexts count
    as corpus bigrams."""
    l1, l2, l3 = lambdas
    toks = {i: t.split() for i, t in corpus}
    uni, big, tri = {}, {}, {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for a, b, c in zip(t, t[1:], t[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    N = sum(uni.values())
    V = len(uni)
    a_ = alpha

    def p1(w):
        return (uni[w] + a_) / (N + a_ * V)

    def p2(pv, w):
        return (big[(pv, w)] + a_) / (uni[pv] + a_ * V)

    def p3(p2v, p1v, w):
        return (tri[(p2v, p1v, w)] + a_) / (big[(p2v, p1v)] + a_ * V)

    out = {}
    for i, t in toks.items():
        if not t:
            out[i] = (0, None, None)
            continue
        terms = [round(-_math.log(p1(t[0])), 6)]
        if len(t) >= 2:
            l1n, l2n = l1 / (l1 + l2), l2 / (l1 + l2)
            terms.append(round(-_math.log(
                l1n * p1(t[1]) + l2n * p2(t[0], t[1])), 6))
        for j in range(2, len(t)):
            terms.append(round(-_math.log(
                l1 * p1(t[j]) + l2 * p2(t[j - 1], t[j])
                + l3 * p3(t[j - 2], t[j - 1], t[j])), 6))
        m = sum(terms) / len(terms)
        out[i] = (len(terms), round(m, 6), round(_math.exp(m), 6))
    return out


@given(st.lists(st.lists(st.sampled_from(_WORDS), max_size=12),
                min_size=1, max_size=10))
@settings(max_examples=10, deadline=None)
def test_trigram_lm_matches_python_reference(docs_tokens):
    spark = test_trigram_lm_matches_python_reference._spark
    corpus = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_terms, r.mean_nll, r.ppl)
           for r in ngram_lm_score(df, alpha=0.5, order=3).collect()}
    want = _py_lm3(corpus)
    for i, (n, m, p) in want.items():
        gn, gm, gp = got[i]
        assert gn == n, (i, gn, n)
        if m is None:
            assert gm is None and gp is None
        else:
            assert gm == pytest.approx(m, abs=2e-6)
            assert gp == pytest.approx(p, rel=1e-5)


@pytest.fixture(autouse=True, scope="module")
def _bind_spark(spark):
    test_ngram_lm_matches_python_reference._spark = spark
    test_trigram_lm_matches_python_reference._spark = spark
    test_remove_dup_spans_matches_python_reference._spark = spark
    test_dup_spans_match_python_reference._spark = spark
    yield


def test_remove_dup_spans_hand_case(spark):
    """k=2: 'x y' duplicated across docs — every covered token goes,
    including BOTH copies in doc 0; untouched docs round-trip."""
    from oxbow_spark.operators.text import remove_dup_spans

    df = spark.createDataFrame(
        [(0, "x y x y"), (1, "q x y r"), (2, "u v w"), (3, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in remove_dup_spans(df, k=2).collect()}
    # doc 0: grams 'x y','y x','x y' -> 'x y' dup (3 occurrences),
    # 'y x' unique BUT its span [2,4) merges with the overlapping dup
    # spans? no: only dup grams mark spans -> spans [1,3) and [3,5)
    # merge to [1,5) -> all four tokens removed
    assert got[0].clean_text == "" and got[0].n_removed_tokens == 4
    assert got[1].clean_text == "q r" and got[1].n_removed_tokens == 2
    assert got[2].clean_text == "u v w" and got[2].n_removed_tokens == 0
    assert got[3].clean_text == "" and got[3].n_tokens == 0


@given(st.lists(st.lists(st.sampled_from(_WORDS), max_size=14),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=10, deadline=None)
def test_remove_dup_spans_matches_python_reference(docs_tokens, k):
    from oxbow_spark.operators.text import remove_dup_spans

    spark = test_remove_dup_spans_matches_python_reference._spark
    corpus = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed_tokens)
           for r in remove_dup_spans(df, k=k).collect()}
    # reference: covered positions from _py_dup_spans' marking rule
    toks = {i: t.split() for i, t in corpus}
    cnt: dict[str, int] = {}
    for t in toks.values():
        for j in range(len(t) - k + 1):
            g = " ".join(t[j:j + k])
            cnt[g] = cnt.get(g, 0) + 1
    for i, t in toks.items():
        covered = set()
        for j in range(len(t) - k + 1):
            if cnt[" ".join(t[j:j + k])] > 1:
                covered.update(range(j, j + k))
        clean = " ".join(x for j, x in enumerate(t) if j not in covered)
        assert got[i] == (clean, len(covered)), (i, got[i], clean)
