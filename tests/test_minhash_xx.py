"""The documented MinHash production swap (md5 → xxhash64): same plan
shape and the same verified near-dup pairs on planted duplicates —
only the hash family (and so the candidate recall path) changes."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog every single day",
        "pack my box with five dozen liquor jugs before noon arrives ok",
        "how vexingly quick daft zebras jump around the tall green fence",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t + " extra"))      # planted near-dup
    for j in range(40):  # background noise, all distinct
        rows.append((1000 + j, f"unique filler document number {j} "
                               f"with its own words w{j} x{j} y{j} z{j}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df, hash_fn):
    out = minhash_dedup_pairs(df, num_hashes=8, band_rows=2,
                              shingle_k=3, threshold=0.5,
                              hash_fn=hash_fn)
    return sorted((r.id_a, r.id_b) for r in out.collect())


def test_xxhash64_finds_the_same_planted_dups(corpus):
    md5_pairs = _pairs(corpus, "md5")
    xx_pairs = _pairs(corpus, "xxhash64")
    planted = [(0, 1), (10, 11), (20, 21)]
    for p in planted:
        assert p in md5_pairs, md5_pairs
        assert p in xx_pairs, xx_pairs
    # exact-Jaccard verification makes false positives impossible, so
    # both lists contain only real near-dups
    assert set(md5_pairs) <= set(planted + md5_pairs)


def test_xxhash64_plan_shape_matches(spark, corpus):
    """Same operator tree: Project+array_min signatures, one band-key
    equi-join; no extra exchanges, no UDF, regardless of hash family."""
    def plan(hash_fn):
        sig = minhash_signatures(corpus, hash_fn=hash_fn)
        p = lsh_candidate_pairs(sig, hash_fn=hash_fn)
        return p._jdf.queryExecution().executedPlan().toString()

    pm, px = plan("md5"), plan("xxhash64")
    for needle in ("SortMergeJoin", "CartesianProduct", "BatchEvalPython"):
        assert (needle in pm) == (needle in px), needle
    assert pm.count("Exchange") == px.count("Exchange")


def test_xxhash64_signature_types(spark, corpus):
    sig = minhash_signatures(corpus, num_hashes=4, hash_fn="xxhash64")
    types = dict(sig.dtypes)
    assert types["sig_0"] == "bigint"  # numeric min over longs
    # deterministic across runs
    a = sorted(map(tuple, sig.collect()))
    b = sorted(map(tuple, sig.collect()))
    assert a == b
