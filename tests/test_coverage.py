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


def test_genomecov_hist_random_vs_python(spark):
    """Boundary-sweep depth histogram vs brute-force per-position
    counting: depth>=1 rows without sizes; with sizes, depth-0
    remainders, fully-uncovered chroms, fracs and the genome rollup."""
    import random

    from oxbow_spark.operators.coverage import genomecov_hist

    rng = random.Random(37)
    sizes = {"c0": 3000, "c1": 2500, "c2": 800}   # c2 stays uncovered
    rows = []
    for _ in range(180):
        ch = f"c{rng.randrange(2)}"
        st = rng.randrange(0, sizes[ch] - 200)
        rows.append((ch, st, st + rng.randrange(1, 200)))
    df = spark.createDataFrame(rows, "chrom string, start long, end long")

    cov = {ch: [0] * ln for ch, ln in sizes.items()}
    for ch, st, en in rows:
        for p in range(st, en):
            cov[ch][p] += 1
    exp = {}
    for ch, arr in cov.items():
        for d in set(arr):
            exp[(ch, d)] = sum(1 for x in arr if x == d)
    exp = {k: v for k, v in exp.items() if v > 0}

    got_nosz = {(r.chrom, r.depth): r.n_bases
                for r in genomecov_hist(df).collect()}
    assert got_nosz == {k: v for k, v in exp.items() if k[1] > 0}

    out = genomecov_hist(df, sizes=sizes).collect()
    got = {(r.chrom, r.depth): (r.n_bases, r.chrom_len, r.frac)
           for r in out}
    for (ch, d), n in exp.items():
        nb, ln, fr = got[(ch, d)]
        assert nb == n and ln == sizes[ch]
        assert fr == n / sizes[ch]
    assert got[("c2", 0)] == (800, 800, 1.0)
    genome = {d: n for (ch, d), (n, _l, _f) in got.items()
              if ch == "genome"}
    glen = sum(sizes.values())
    for d in genome:
        assert genome[d] == sum(n for (ch, dd), n in exp.items()
                                if dd == d)
        assert got[("genome", d)][1] == glen
    assert sum(genome.values()) == glen
    # histogram keys are exactly the per-chrom expectations + rollup
    assert {k for k in got if k[0] != "genome"} == set(exp)


def test_genomecov_hist_bookended_and_nested(spark):
    from oxbow_spark.operators.coverage import genomecov_hist

    df = spark.createDataFrame(
        [("c", 0, 10), ("c", 10, 20),      # bookended: depth 1 across
         ("c", 5, 15),                     # overlap bump
         ("d", 2, 4), ("d", 2, 4)],        # exact duplicate: depth 2
        "chrom string, start long, end long")
    got = {(r.chrom, r.depth): r.n_bases
           for r in genomecov_hist(df, sizes={"c": 25, "d": 6}).collect()
           if r.chrom != "genome"}
    assert got == {("c", 1): 10, ("c", 2): 10, ("c", 0): 5,
                   ("d", 2): 2, ("d", 0): 4}


def test_genomecov_segments_bga_vs_python(spark):
    """-bga segments: constant-depth runs with zero gaps; with sizes,
    leading/trailing zero runs and uncovered chroms appear."""
    import random

    from oxbow_spark.operators.coverage import genomecov_segments

    rng = random.Random(41)
    sizes = {"c0": 2000, "c1": 1200, "c2": 300}
    rows = []
    for _ in range(80):
        ch = f"c{rng.randrange(2)}"
        st = rng.randrange(10, sizes[ch] - 150)
        rows.append((ch, st, st + rng.randrange(1, 140)))
    df = spark.createDataFrame(rows, "chrom string, start long, end long")

    cov = {ch: [0] * ln for ch, ln in sizes.items()}
    for ch, st, en in rows:
        for p in range(st, en):
            cov[ch][p] += 1

    def runs(arr, lo, hi):
        out = []
        p = lo
        while p < hi:
            q = p
            while q < hi and arr[q] == arr[p]:
                q += 1
            out.append((p, q, arr[p]))
            p = q
        return out

    got = sorted((r.chrom, r.start, r.end, r.depth)
                 for r in genomecov_segments(df, sizes=sizes).collect())
    exp = []
    for ch, arr in cov.items():
        exp.extend((ch, s, e, d) for s, e, d in runs(arr, 0, sizes[ch]))
    # maximal constant-depth runs, exactly like bedtools -bga: net-zero
    # (bookended) boundaries are dropped, so no same-depth splits
    assert got == sorted(exp)
    assert ("c2", 0, 300, 0) in set(got)

    # base conservation without sizes: depth-weighted bases == interval bp
    nosz = genomecov_segments(df).collect()
    assert sum((r.end - r.start) * r.depth for r in nosz) \
        == sum(e - s for _c, s, e in rows)


def test_genomecov_split_bp_equals_plain(spark):
    """Chunked (split_bp) boundary sweep ≡ plain, adversarial shapes:
    chunk-spanning giants, boundaries exactly on chunk edges, bookended
    runs, depth-0 interior gaps straddling chunk edges."""
    import random

    from oxbow_spark.operators.coverage import (genomecov_hist,
                                                genomecov_segments)

    rng = random.Random(53)
    rows = []
    for _ in range(300):
        ch = f"c{rng.randrange(3)}"
        st = rng.randrange(0, 2000)
        ln = rng.choice([1, 2, 9, 64, 100, 101, 333, 1500])
        rows.append((ch, st, st + ln))
    # exact chunk-edge boundaries, bookends, an isolated far interval
    # (empty chunks between it and the rest), and a duplicate pile
    rows += [("c0", 100, 200), ("c0", 200, 300), ("c1", 0, 2000),
             ("c2", 9000, 9010)] + [("c1", 500, 600)] * 4
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    sizes = {"c0": 12000, "c1": 12000, "c2": 12000, "c3": 40}

    for fn, kw in ((genomecov_segments, {}),
                   (genomecov_segments, {"sizes": sizes}),
                   (genomecov_hist, {}),
                   (genomecov_hist, {"sizes": sizes})):
        plain = sorted(tuple(r) for r in fn(df, **kw).collect())
        for bp in (100, 128, 333, 1 << 20):
            got = sorted(tuple(r)
                         for r in fn(df, split_bp=bp, **kw).collect())
            assert got == plain, (fn.__name__, kw.keys(), bp)


def test_genomecov_split_bp_plan_windows_on_chunk(spark):
    """The chunked sweep's heavy running-sum window must key on
    (chrom, chunk) — per-chrom boundary streams must never land in one
    window task."""
    from oxbow_spark.operators.coverage import _depth_segments

    df = spark.createDataFrame(
        [("c", 0, 10)], "chrom string, start long, end long")
    plan = _depth_segments(df, "chrom", "start", "end", split_bp=100) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # the boundary-stream window spec must include the chunk key
    assert "windowspecdefinition(chrom#" in plan and "_k#" in plan, plan
    w_specs = [ln for ln in plan.splitlines()
               if "windowspecdefinition" in ln and "_p#" in ln]
    assert w_specs and all("_k#" in ln for ln in w_specs), plan
