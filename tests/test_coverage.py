"""Binned depth profiles: hand-computed coverage on constructed
intervals, clipping at bin edges, empty/degenerate handling, plan shape
(explode + one partial-agg shuffle, no join/window/sort)."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.coverage import depth_profile


@pytest.fixture(scope="module")
def iv(spark):
    # bin_size=10: interval [3, 27) covers bins 0 (7bp), 1 (10bp), 2 (7bp)
    return spark.createDataFrame(
        [
            ("chr1", 3, 27),
            ("chr1", 5, 8),     # inside bin 0 (3bp)
            ("chr1", 19, 21),   # straddles bins 1/2 (1bp each)
            ("chr2", 0, 10),    # exactly bin 0
            ("chr2", 9, 9),     # degenerate: dropped
        ],
        "chrom string, start long, end long",
    )


def test_depths_exact(iv):
    got = {(r.chrom, r.bin): r for r in depth_profile(iv, 10).collect()}
    assert got[("chr1", 0)].n_reads == 2
    assert got[("chr1", 0)].covered_bp == 7 + 3
    assert got[("chr1", 1)].n_reads == 2
    assert got[("chr1", 1)].covered_bp == 10 + 1
    assert got[("chr1", 2)].n_reads == 2
    assert got[("chr1", 2)].covered_bp == 7 + 1
    assert got[("chr2", 0)].n_reads == 1
    assert got[("chr2", 0)].covered_bp == 10
    assert got[("chr2", 0)].mean_depth == pytest.approx(1.0)
    assert got[("chr1", 1)].bin_start == 10
    assert len(got) == 4  # no bins from the degenerate interval, no empties


def test_total_bp_conserved(iv, spark):
    """Sum of clipped per-bin bp must equal the sum of interval lengths
    (nothing double-counted or dropped by the explode)."""
    from pyspark.sql import functions as F

    total = depth_profile(iv, 10).agg(F.sum("covered_bp")).collect()[0][0]
    truth = iv.where(F.col("end") > F.col("start")) \
        .agg(F.sum(F.col("end") - F.col("start"))).collect()[0][0]
    assert total == truth


def test_bin_size_invariance(iv):
    """Different bin sizes re-bucket the same mass."""
    for bs in (5, 16, 100):
        got = depth_profile(iv, bs).collect()
        assert sum(r.covered_bp for r in got) == 39  # 24+3+2+10; degenerate drops


def test_plan_single_agg_no_join(iv):
    plan = depth_profile(iv, 10)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan and "Sort" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # one shuffle: the (chrom,bin) agg
    assert "partial" in plan.lower() or "HashAggregate" in plan, plan
