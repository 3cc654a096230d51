"""The one production/oracle-parity switch (`oxbow_spark/config.py`):
flipping it changes operator-family DEFAULTS (md5→xxhash64 dedup
hashing, decimal→double sums, exact→fast pair dots) while preserving
the semantics each family guarantees; explicit per-call args win."""

from __future__ import annotations

import pytest

import oxbow_spark.config as cfg


@pytest.fixture
def production():
    cfg.set_production(True)
    try:
        yield
    finally:
        cfg.set_production(False)


def _docs(spark):
    rows = []
    for i in range(60):
        base = f"the quick brown fox {i % 7} jumps over the lazy dog " \
               f"while counting {i % 7} stars"
        rows.append((i, base))
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # exact copies
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_defaults_are_oracle_parity():
    assert cfg.production() is False
    assert cfg.default_hash_fn() == "md5"
    assert cfg.default_exact() is True


def test_exact_dedup_same_groups_either_mode(spark, production):
    from oxbow_spark.operators.dedup import exact_dedup

    df = _docs(spark)
    prod = {(r.keep_id, r.n_copies) for r in exact_dedup(df).collect()}
    oracle = {(r.keep_id, r.n_copies)
              for r in exact_dedup(df, hash_fn="md5").collect()}
    assert prod == oracle
    # the production digest really is xxhash64 (JVM-side, no md5)
    plan = exact_dedup(df)._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan and "md5" not in plan, plan


def test_minhash_production_plan_and_threshold(spark, production):
    from oxbow_spark.operators.dedup import minhash_dedup_pairs

    df = _docs(spark)
    pairs = minhash_dedup_pairs(df, num_hashes=8, band_rows=2,
                                threshold=0.5)
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan, plan
    got = pairs.collect()
    # the verify stage still enforces the Jaccard threshold: every
    # exact copy pair must survive regardless of the hash family
    ids = {(r.id_a, r.id_b) for r in got}
    for i in range(10):
        assert (i, 100 + i) in ids
    for r in got:
        assert r.jaccard >= 0.5


def test_semdedup_drop_set_stable_across_exactness(spark, production):
    import random

    from oxbow_spark.operators.similarity import (ivf_fit,
                                                  semantic_dup_drops)

    rng = random.Random(3)
    rows = []
    for i in range(80):
        v = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, [float(round(x, 3)) for x in v]))
        if i % 4 == 0:  # strong near-dup partner
            rows.append((1000 + i,
                         [float(round(x * 1.01 + 0.001, 3)) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_fit(emb, nlist=4, max_iter=3, order_col="vec_id")
    # production default (exact=None -> fast dots)
    fast = {r.vec_id for r in
            semantic_dup_drops(emb, cents, threshold=0.9).collect()}
    exact = {r.vec_id for r in
             semantic_dup_drops(emb, cents, threshold=0.9,
                                exact=True).collect()}
    assert fast == exact  # threshold-stable on non-degenerate data
    assert fast  # and the drop set is non-trivial


def test_exact_sum_production_is_plain_double(spark, production):
    from pyspark.sql import functions as F

    from oxbow_spark.operators.zoom import exact_sum

    df = spark.range(1000).select(
        (F.col("id") % 97 * 0.015625).alias("v"))  # exact binary fracs
    prod = df.agg(exact_sum("v", "s")).collect()[0].s
    oracle = df.agg(exact_sum("v", "s", exact=True)).collect()[0].s
    assert prod == pytest.approx(oracle, abs=1e-9)
    plan = df.agg(exact_sum("v", "s"))._jdf.queryExecution() \
        .analyzed().toString()
    assert "decimal" not in plan.lower(), plan


def test_explicit_arg_beats_global(spark, production):
    from oxbow_spark.operators.dedup import exact_dedup

    df = _docs(spark)
    plan = exact_dedup(df, hash_fn="md5")._jdf.queryExecution() \
        .analyzed().toString()
    assert "md5" in plan and "xxhash64" not in plan, plan
