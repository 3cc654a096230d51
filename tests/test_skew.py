"""Skew operators: result equality with the plain formulations on a
deliberately skewed dataset, plan-shape assertions (the join key must
include the salt), and retry determinism (no rand())."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators.skew import salted_join, two_phase_distinct_count


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the classic hot-key shape
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") * 7).alias("payload"),
    )
    small = spark.range(0, 97).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_equals_plain(skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left(skewed):
    big, small = skewed
    only_big = big.withColumn("k", F.col("k") + 1000)  # no matches
    out = salted_join(only_big, small, "k", n_salts=4, how="left")
    rows = out.collect()
    assert len(rows) == only_big.count()
    assert all(r.name is None for r in rows)


def test_salted_join_shuffles_on_salt(skewed):
    big, small = skewed
    plan = salted_join(big, small, "k", n_salts=8)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "_salt" in plan


def test_salted_join_deterministic(skewed):
    big, small = skewed
    a = sorted(map(tuple, salted_join(big, small, "k").collect()))
    b = sorted(map(tuple, salted_join(big, small, "k").collect()))
    assert a == b


def test_two_phase_distinct_count(spark):
    df = spark.createDataFrame(
        [("g1", v % 50) for v in range(2000)] + [("g2", v) for v in range(30)],
        "g string, v long",
    )
    got = {
        (r.g, r.n_distinct)
        for r in two_phase_distinct_count(df, "g", "v", n_salts=8).collect()
    }
    assert got == {("g1", 50), ("g2", 30)}


def test_salted_join_rejects_outer_how(skewed):
    import pytest as _pytest

    from oxbow_spark.operators.skew import salted_join

    big, small = skewed
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="unsupported"):
            salted_join(big, small, "k", how=how)


def test_salted_join_error_names_rewrite(skewed):
    """The right/full rejection must tell the user the working rewrite
    (swap sides + how='left'; anti-join union / AQE for full outer)."""
    import pytest as _pytest

    from oxbow_spark.operators.skew import salted_join

    big, small = skewed
    with _pytest.raises(ValueError, match="how='left'"):
        salted_join(big, small, "k", how="right")
    with _pytest.raises(ValueError, match="skewJoin"):
        salted_join(big, small, "k", how="full")


def test_salted_join_right_rewrite_equivalence(skewed):
    """The documented rewrite — swap sides, how='left' — reproduces the
    plain right outer join exactly."""
    from oxbow_spark.operators.skew import salted_join

    big, small = skewed
    plain = small.join(big, "k", "right")
    rewritten = salted_join(big, small, "k", how="left")
    cols = sorted(plain.columns)
    assert (sorted(map(tuple, plain.select(cols).collect()))
            == sorted(map(tuple, rewritten.select(cols).collect())))
