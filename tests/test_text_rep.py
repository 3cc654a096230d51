"""Repetition metrics and BM25 retrieval (`operators/text.py`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),            # all distinct
        (2, "spam spam spam spam spam"),          # one token repeated
        (3, "to be or not to be"),                # bigram "to be" twice
        (4, "solo"),                              # single token, no bigrams
        (5, ""),                                  # empty text
        (6, "x y x y x y x y"),                   # dominant bigram, overlap
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_repetition_stats_values(docs):
    got = {r["doc_id"]: r for r in TX.repetition_stats(docs).collect()}
    # doc 1: no repetition at all
    assert got[1]["dup_token_frac"] == 0.0
    assert got[1]["top_token_frac"] == pytest.approx(5 / 19)  # "alpha"/total
    # doc 2: total repetition; top token covers every char
    assert got[2]["dup_token_frac"] == pytest.approx(4 / 5)
    assert got[2]["top_token_frac"] == 1.0
    assert not got[2]["repetition_ok"]
    # doc 3: "to be" twice -> 2 * (len("to be") - 1 space) = 2*4 = 8 over 13
    assert got[3]["top_2gram_frac"] == pytest.approx(8 / 13)
    # doc 4: single token, bigram metrics zero
    assert got[4]["n_tokens"] == 1 and got[4]["top_2gram_frac"] == 0.0
    # doc 5: split('') -> [''] — degenerate but defined, no NaN/inf anywhere
    for c in ("dup_token_frac", "top_token_frac", "top_2gram_frac"):
        assert all(not math.isnan(got[i][c]) for i in got)
    # doc 6: overlapping "x y" occurrences clamp at 1.0
    assert got[6]["top_2gram_frac"] == 1.0


def test_repetition_stats_is_shuffle_free(docs):
    # the operator must stay a pure Project over the scan: no Exchange
    plan = TX.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_ranks_exact_matches_first(spark):
    rows = [
        (1, "apple banana cherry"),
        (2, "apple apple apple apple"),
        (3, "banana banana banana"),
        (4, "durian elderberry fig"),
        (5, "apple banana apple banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = TX.bm25_topk(df, ["apple", "banana"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    # doc 5 matches both terms repeatedly -> best; doc 4 (no match) absent
    assert ids[0] == 5
    assert 4 not in ids
    assert all(out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1))


def test_bm25_deterministic_tie_break(spark):
    # identical docs score identically; order falls back to doc_id
    rows = [(i, "same text here") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = TX.bm25_topk(df, ["same"], k=4).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    assert len({r["score"] for r in out}) == 1


def test_bm25_empty_query_or_no_hits(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    assert TX.bm25_topk(df, ["zzz"], k=5).count() == 0
