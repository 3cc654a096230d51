"""Benchmark decontamination: exact overlap counts on constructed docs,
edge cases (empty/short text), and the 100 TB plan shape (benchmark gram
set broadcast, no cartesian product)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators.decontam import benchmark_grams, ngram_decontaminate


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [
            # 5 tokens -> 3 distinct 3-shingles, all inside the benchmark text
            (1, "the quick brown fox jumps"),
            # contains exactly one benchmark 3-gram ("lazy dog sleeps")
            (2, "my lazy dog sleeps all day long"),
            # no overlap
            (3, "completely unrelated words here today"),
            # short text (< k tokens): single whole-text shingle, no overlap
            (4, "tiny doc"),
            # empty text
            (5, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog sleeps")],
        "doc_id long, text string",
    )
    return docs, bench


def test_overlap_counts_exact(frames):
    docs, bench = frames
    got = {r.doc_id: r for r in
           ngram_decontaminate(docs, bench, shingle_k=3).collect()}
    assert got[1].n_shingles == 3 and got[1].n_matched == 3
    assert got[1].contamination == pytest.approx(1.0)
    assert got[1].contaminated is True
    assert got[2].n_matched == 1 and got[2].contaminated is True
    assert got[2].contamination == pytest.approx(1 / got[2].n_shingles)
    assert got[3].n_matched == 0 and got[3].contaminated is False
    assert got[4].n_shingles == 1 and got[4].n_matched == 0
    # empty text: one '' shingle, never matches a real benchmark gram
    assert got[5].n_matched == 0 and got[5].contaminated is False
    assert len(got) == 5  # every corpus doc comes back, matched or not


def test_min_hits_threshold(frames):
    docs, bench = frames
    got = {r.doc_id: r.contaminated for r in
           ngram_decontaminate(docs, bench, shingle_k=3, min_hits=2).collect()}
    assert got[1] is True      # 3 hits
    assert got[2] is False     # only 1 hit < min_hits
    assert got[3] is False


def test_benchmark_grams_distinct(frames):
    _, bench = frames
    grams = benchmark_grams(bench, shingle_k=3)
    rows = [r.g for r in grams.collect()]
    assert len(rows) == len(set(rows)) == 8  # 10 tokens -> 8 shingles, unique
    assert "the quick brown" in rows and "lazy dog sleeps" in rows


def test_plan_broadcasts_benchmark_no_cartesian(frames):
    docs, bench = frames
    plan = ngram_decontaminate(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
