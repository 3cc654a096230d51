"""Equality battery for the r15 Arrow text kernels.

`text.repetition_stats(kernel=True)` (the default) and
`dedup.simhash(kernel=True)` must be BIT-identical to their retained
JVM-expression formulations — same tokenizer semantics
(`split(trim(text), '\\s+')` with Java's ASCII-only \\s), same integer
metric arithmetic, same final float64 divisions — on the real corpus
and on a unicode/degenerate edge corpus chosen to break any tokenizer
that is *almost* the Java one (Python's \\s matches \\x85/\\xa0/\\u2028…,
Java's does not; trim strips only ASCII space; split keeps leading and
trailing empty tokens).
"""

from __future__ import annotations

import pytest

from oxbow_spark.operators import dedup as D
from oxbow_spark.operators import text as T
from oxbow_spark.operators.dedup import _py_tokens

EDGE_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),                       # split("") -> [""]
    (3, "   "),                    # trim -> "" -> [""]
    (4, "\t"),                     # trim keeps \t -> ["", ""]
    (5, None),                     # null text
    (6, "a\xa0b  c 　d"),      # NBSP/ideographic space: NOT Java \s
    (7, "a\tb\nc\x0bd\x0ce\rf  g"),  # every Java \s member
    (8, "spam spam spam spam spam"),
    (9, "\U0001d54f \U0001d550 \U0001d54f \U0001d550 \U0001d54f"),  # astral
    (10, "  leading and trailing  "),
    (11, "one"),
    (12, "字 字 字 测试 测试"),
    (13, "a a a a"),               # overlapping-bigram char-mass clamp
    (14, " ".join(f"w{i % 7}" for i in range(10000))),  # 10k-token doc
    (15, "x\x85y \x1cz"),          # NEL + FS: Python \s members, not Java's
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_py_tokens_matches_jvm_split(spark, edge_df):
    """The shared Python tokenizer must reproduce split(trim(text),
    '\\s+') token-for-token, including kept empty tokens."""
    from pyspark.sql import functions as F

    jvm = {
        r["doc_id"]: r["t"]
        for r in edge_df.select(
            "doc_id", D.tokens(F.col("text")).alias("t")).collect()
    }
    for doc_id, text in EDGE_ROWS:
        expected = jvm[doc_id]
        got = None if text is None else _py_tokens(text)
        assert got == expected, (doc_id, got, expected)


def test_repetition_kernel_matches_expression_edges(edge_df):
    a = _rows(T.repetition_stats(edge_df, kernel=True))
    b = _rows(T.repetition_stats(edge_df, kernel=False))
    assert a == b


def test_repetition_kernel_matches_expression_corpus(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _rows(T.repetition_stats(docs, kernel=True))
    b = _rows(T.repetition_stats(docs, kernel=False))
    assert a == b


def test_simhash_kernel_matches_expression_edges(edge_df):
    a = _rows(D.simhash(edge_df, kernel=True))
    b = _rows(D.simhash(edge_df, kernel=False))
    assert a == b


def test_simhash_kernel_matches_expression_corpus(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _rows(D.simhash(docs, kernel=True))
    b = _rows(D.simhash(docs, kernel=False))
    assert a == b


def test_minhash_sig_kernel_matches_expression_edges(edge_df):
    for H, k in ((8, 3), (6, 3), (8, 2), (4, 4)):
        a = _rows(D.minhash_signatures(
            edge_df, num_hashes=H, shingle_k=k, kernel=True))
        b = _rows(D.minhash_signatures(
            edge_df, num_hashes=H, shingle_k=k, kernel=False))
        assert a == b, (H, k)


def test_minhash_sig_kernel_matches_expression_corpus(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _rows(D.minhash_signatures(docs, kernel=True))
    b = _rows(D.minhash_signatures(docs, kernel=False))
    assert a == b


def test_minhash_sig_kernel_skips_xxhash_path(edge_df):
    """The production xxhash64 swap keeps the pure-JVM formulation: the
    kernel only covers the md5/oracle path."""
    df = D.minhash_signatures(edge_df, hash_fn="xxhash64", kernel=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan


def test_shingle_set_kernel_matches_expression_edges(edge_df):
    for k in (2, 3, 5):
        a = _rows(D.shingle_stage(edge_df, shingle_k=k, kernel=True))
        b = _rows(D.shingle_stage(edge_df, shingle_k=k, kernel=False))
        assert a == b, k


def test_shingle_set_kernel_matches_expression_corpus(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _rows(D.shingle_stage(docs, kernel=True))
    b = _rows(D.shingle_stage(docs, kernel=False))
    assert a == b


def test_minhash_dedup_pairs_kernel_matches_expression(spark, sf_dir):
    """Full-pipeline parity: kernel and JVM formulations of the MinHash
    near-dup pipeline produce the identical verified pair set."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = _rows(D.minhash_dedup_pairs(docs, kernel=True))
    spark.catalog.clearCache()
    b = _rows(D.minhash_dedup_pairs(docs, kernel=False))
    spark.catalog.clearCache()
    assert a == b and len(a) > 0


def test_repetition_kernel_single_python_eval_under_filter(spark, edge_df):
    """Guide §4.4: a consumer filter on repetition_ok must not duplicate
    the kernel — exactly ONE ArrowEvalPython in the filtered plan (the
    UDF is nondeterministic precisely to pin this)."""
    from pyspark.sql import functions as F

    filtered = T.repetition_stats(edge_df).where(
        F.col("repetition_ok")).select("doc_id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
