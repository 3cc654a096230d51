"""Interval set algebra (bedtools merge/intersect/subtract semantics):
hand-computed results, bookended-merge rule, full/partial/no coverage
subtraction shapes, plan guards (no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators.interval_ops import (
    complement_intervals,
    intersect_intervals,
    merge_intervals,
    subtract_intervals,
)


@pytest.fixture(scope="module")
def frames(spark):
    a = spark.createDataFrame(
        [
            (1, "chr1", 10, 50),
            (2, "chr1", 60, 70),
            (3, "chr1", 100, 200),
            (4, "chr2", 0, 30),
        ],
        "aid long, chrom string, start long, end long",
    )
    b = spark.createDataFrame(
        [
            ("chr1", 20, 30),    # punches a hole in a1
            ("chr1", 40, 65),    # clips a1 tail and a2 head (spans gap)
            ("chr1", 100, 200),  # fully covers a3
            ("chr2", 100, 130),  # no overlap with a4
        ],
        "chrom string, start long, end long",
    )
    return a, b


def test_merge_overlap_and_bookends(spark):
    df = spark.createDataFrame(
        [("chr1", 1, 5), ("chr1", 5, 9), ("chr1", 3, 6),   # one run 1..9
         ("chr1", 20, 25),                                 # separate
         ("chr2", 1, 4)],
        "chrom string, start long, end long",
    )
    got = {(r.chrom, r.start, r.end): r.n_merged
           for r in merge_intervals(df).collect()}
    assert got == {("chr1", 1, 9): 3, ("chr1", 20, 25): 1, ("chr2", 1, 4): 1}


def test_merge_containment(spark):
    df = spark.createDataFrame(
        [("chr1", 0, 100), ("chr1", 10, 20), ("chr1", 30, 40)],
        "chrom string, start long, end long",
    )
    rows = merge_intervals(df).collect()
    assert len(rows) == 1 and (rows[0].start, rows[0].end) == (0, 100)
    assert rows[0].n_merged == 3


def test_intersect_clips(frames):
    a, b = frames
    bb = b.select("chrom", F.col("start").alias("b_start"),
                  F.col("end").alias("b_end"))
    got = {(r.aid, r.i_start, r.i_end)
           for r in intersect_intervals(a, bb, bin_size=64).collect()}
    assert got == {
        (1, 20, 30), (1, 40, 50),   # a1 x two b intervals
        (2, 60, 65),                # a2 clipped head
        (3, 100, 200),              # full coverage
    }


def test_subtract_shapes(frames):
    a, b = frames
    got = {(r.aid, r.start, r.end)
           for r in subtract_intervals(a, b, bin_size=64,
                                       id_col="aid").collect()}
    assert got == {
        (1, 10, 20), (1, 30, 40),   # hole punched + tail clipped
        (2, 65, 70),                # head clipped
        # a3 fully covered: nothing survives
        (4, 0, 30),                 # untouched passes through whole
    }


def test_subtract_conserves_outside_coverage(frames):
    a, b = frames
    out = subtract_intervals(a, b, bin_size=64, id_col="aid")
    survived = out.agg(F.sum(F.col("end") - F.col("start"))).collect()[0][0]
    # total a bp = 40+10+100+30 = 180; covered: a1 20 (10+10), a2 5, a3 100
    assert survived == 180 - 20 - 5 - 100


def test_no_cartesian_anywhere(frames):
    a, b = frames
    bb = b.select("chrom", F.col("start").alias("b_start"),
                  F.col("end").alias("b_end"))
    for df in (merge_intervals(a.drop("aid")),
               intersect_intervals(a, bb, bin_size=64),
               subtract_intervals(a, b, bin_size=64, id_col="aid")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan


def test_closest(spark):
    from oxbow_spark.operators.interval_ops import closest_intervals

    a = spark.createDataFrame(
        [(1, "chr1", 100, 110),   # overlaps b20
         (2, "chr1", 300, 310),   # between b20(end 120) and b30(start 400)
         (3, "chr1", 398, 399),   # gap 1 to b30
         (4, "chr2", 50, 60),     # chr2 has no b: null match
         (5, "chr1", 120, 130)],  # bookended with b20 end: distance 0
        "a_id long, chrom string, start long, end long",
    )
    b = spark.createDataFrame(
        [(20, "chr1", 105, 120),
         (30, "chr1", 400, 420),
         (31, "chr1", 400, 500)],  # tie on start with b30 -> min id wins
        "b_id long, chrom string, start long, end long",
    )
    got = {r.a_id: (r.b_id, r.distance)
           for r in closest_intervals(a, b, bin_size=64).collect()}
    assert got[1] == (20, 0)
    assert got[2] == (30, 90)     # 400-310 < 300-120
    assert got[3] == (30, 1)      # tie (30 vs 31 both dist 1) -> min id
    assert got[4] == (None, None)
    assert got[5] == (20, 0)      # bookended: half-open distance 0
    assert len(got) == 5


def test_closest_no_cartesian(spark):
    from oxbow_spark.operators.interval_ops import closest_intervals

    a = spark.createDataFrame([(1, "c", 0, 5)],
                              "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame([(2, "c", 9, 12)],
                              "b_id long, chrom string, start long, end long")
    plan = closest_intervals(a, b, bin_size=16)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_complement(spark):
    from oxbow_spark.operators.interval_ops import complement_intervals

    df = spark.createDataFrame(
        [("chr1", 10, 20), ("chr1", 15, 30),   # run 10..30
         ("chr1", 50, 60), ("chr1", 60, 70),   # bookends merge: 50..70
         ("chr1", 90, 95),
         ("chr2", 5, 8)],                      # single run: no gaps
        "chrom string, start long, end long",
    )
    got = {(r.chrom, r.start, r.end)
           for r in complement_intervals(df).collect()}
    assert got == {("chr1", 30, 50), ("chr1", 70, 90)}


# ---------------------------------------------- property-based (hypothesis)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_IV = st.tuples(st.integers(0, 60), st.integers(1, 25)).map(
    lambda t: (t[0], t[0] + t[1]))


@settings(max_examples=12, deadline=None)
@given(st.lists(_IV, min_size=1, max_size=8))
def test_merge_covers_exactly_the_input_positions(ivs):
    spark = _SESSION[0]
    df = spark.createDataFrame([("c", s, e) for s, e in ivs],
                               "chrom string, start long, end long")
    got = merge_intervals(df).collect()
    # 1. output runs are disjoint and non-adjacent
    runs = sorted((r.start, r.end) for r in got)
    for (s1, e1), (s2, e2) in zip(runs, runs[1:]):
        assert e1 < s2
    # 2. the union of positions is preserved exactly
    truth = set()
    for s, e in ivs:
        truth |= set(range(s, e))
    covered = set()
    for s, e in runs:
        covered |= set(range(s, e))
    assert covered == truth
    assert sum(r.n_merged for r in got) == len(ivs)


@settings(max_examples=12, deadline=None)
@given(st.lists(_IV, min_size=1, max_size=6),
       st.lists(_IV, min_size=1, max_size=6))
def test_subtract_partition_law(a_ivs, b_ivs):
    """subtract(a, b) must keep exactly the positions of a not covered
    by b — checked against exhaustive position-set arithmetic."""
    spark = _SESSION[0]
    a = spark.createDataFrame(
        [(i, "c", s, e) for i, (s, e) in enumerate(a_ivs)],
        "aid long, chrom string, start long, end long")
    b = spark.createDataFrame([("c", s, e) for s, e in b_ivs],
                              "chrom string, start long, end long")
    got = subtract_intervals(a, b, bin_size=16, id_col="aid").collect()
    bpos = set()
    for s, e in b_ivs:
        bpos |= set(range(s, e))
    for i, (s, e) in enumerate(a_ivs):
        expect = set(range(s, e)) - bpos
        have = set()
        for r in got:
            if r.aid == i:
                seg = set(range(r.start, r.end))
                assert not (seg & have), "segments overlap"
                have |= seg
        assert have == expect, (i, sorted(have), sorted(expect))


_SESSION = []


@pytest.fixture(autouse=True, scope="module")
def _capture_spark(spark):
    _SESSION.clear()
    _SESSION.append(spark)
    yield


# ---------------------------------------------------------------- split_bp

def _canon_merge(df):
    return sorted((r[0], r[1], r[2], r[3]) for r in df.collect())


def test_merge_split_bp_equals_plain_on_events(spark, sf_dir):
    """Range-chunked merge (pre-split + boundary stitch) must equal the
    plain per-chrom pass exactly on the oracle events intervals —
    including n_merged, which weight-0 continuation pieces keep exact."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("chrom"),
        (F.unix_timestamp("ts")).alias("start"),
        (F.unix_timestamp("ts") + 300).alias("end"),
    )
    plain = _canon_merge(merge_intervals(ev))
    for bp in (128, 1024, 1 << 20):
        assert _canon_merge(merge_intervals(ev, split_bp=bp)) == plain, bp


def test_merge_split_bp_spanning_and_bookended(spark):
    """Intervals spanning many chunks, exact-boundary bookends, and
    degenerate chains stitch back to the plain result."""
    rows = [
        ("c", 0, 1000),      # spans 10 chunks at bp=100
        ("c", 1000, 1100),   # bookended at a chunk boundary -> same run
        ("c", 1200, 1250),   # separate
        ("c", 300, 320),     # nested inside the big one
        ("d", 95, 105),      # straddles one boundary
        ("d", 105, 110),     # bookend continues it
        ("d", 250, 260),     # isolated, interior
        ("e", 100, 200),     # exactly one full chunk
    ]
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    plain = _canon_merge(merge_intervals(df))
    assert _canon_merge(merge_intervals(df, split_bp=100)) == plain
    assert _canon_merge(merge_intervals(df, split_bp=7)) == plain
    # sanity: the expected merged picture
    assert plain == sorted([
        ("c", 0, 1100, 3), ("c", 1200, 1250, 1),
        ("d", 95, 110, 2), ("d", 250, 260, 1), ("e", 100, 200, 1)])


def test_merge_split_bp_plan_windows_on_chunk(spark):
    """The chunked path's heavy window must key on (chrom, chunk), not
    chrom alone — that is the whole point of the scale path."""
    df = spark.createDataFrame(
        [("c", 0, 10)], "chrom string, start long, end long")
    plan = merge_intervals(df, split_bp=100)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "_k" in plan, plan


def test_subtract_complement_split_bp_passthrough(spark):
    a = spark.createDataFrame(
        [(1, "c", 0, 500)], "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [("c", 100, 200), ("c", 180, 300)], "chrom string, start long, end long")
    plain = sorted(tuple(r) for r in subtract_intervals(
        a, b, bin_size=64, id_col="a_id").collect())
    chunked = sorted(tuple(r) for r in subtract_intervals(
        a, b, bin_size=64, id_col="a_id", split_bp=100).collect())
    assert plain == chunked
    cp = sorted(tuple(r) for r in complement_intervals(b).collect())
    cc = sorted(tuple(r) for r in complement_intervals(b, split_bp=64).collect())
    assert cp == cc


def test_merge_split_bp_random_property(spark):
    """Randomized stitched ≡ plain equality, adversarial shapes: heavy
    overlap piles, exact-boundary starts/ends, chunk-spanning giants."""
    import random

    rng = random.Random(17)
    rows = []
    for _ in range(400):
        c = rng.choice(["a", "b"])
        s = rng.randrange(0, 1000)
        ln = rng.choice([1, 2, 7, 50, 100, 101, 250, 999])
        rows.append((c, s, s + ln))
    # exact multiples of the split width on both edges
    rows += [("a", 100, 200), ("a", 200, 300), ("b", 0, 1000),
             ("b", 500, 600), ("a", 999, 1001)]
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    plain = _canon_merge(merge_intervals(df))
    for bp in (100, 128, 333, 1 << 20):
        assert _canon_merge(merge_intervals(df, split_bp=bp)) == plain, bp


def test_overlap_join_min_fraction(spark):
    from oxbow_spark.operators.interval_join import overlap_join

    a = spark.createDataFrame(
        [(1, "c", 0, 100)], "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [(10, "c", 90, 200), (11, "c", 40, 200), (12, "c", 150, 300)],
        "b_id long, chrom string, b_start long, b_end long")
    full = overlap_join(a, b, bin_size=64, right_start="b_start",
                        right_end="b_end")
    assert sorted(r.b_id for r in full.collect()) == [10, 11]
    # -f 0.5: overlap must cover >= 50% of the LEFT interval (100bp)
    half = overlap_join(a, b, bin_size=64, right_start="b_start",
                        right_end="b_end", min_overlap_frac=0.5)
    assert sorted(r.b_id for r in half.collect()) == [11]


def test_closest_k_nearest(spark):
    from oxbow_spark.operators.interval_ops import closest_intervals

    a = spark.createDataFrame(
        [(1, "c", 100, 110)], "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [(10, "c", 100, 105), (11, "c", 120, 130), (12, "c", 60, 70),
         (13, "c", 300, 310)],
        "b_id long, chrom string, start long, end long")
    got = sorted((r.rank, r.b_id, r.distance)
                 for r in closest_intervals(a, b, bin_size=64, k=3).collect())
    # overlap (0), next at 10, prev at 30 — bedtools -k 3 order
    assert got == [(1, 10, 0), (2, 11, 10), (3, 12, 30)]
    # k=1 keeps the original single-winner schema (no rank column)
    one = closest_intervals(a, b, bin_size=64).columns
    assert "rank" not in one


def test_merge_distance_option(spark):
    rows = [("c", 0, 10), ("c", 15, 20), ("c", 40, 50), ("d", 0, 5)]
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    # -d 5: the 5-gap pair joins, the 20-gap pair does not
    got = _canon_merge(merge_intervals(df, distance=5))
    assert got == sorted([("c", 0, 20, 2), ("c", 40, 50, 1), ("d", 0, 5, 1)])
    # chunked path agrees, including cross-chunk distance joins
    for bp in (7, 16, 100):
        assert _canon_merge(merge_intervals(df, distance=5, split_bp=bp)) == got
    rows2 = [("c", i * 12, i * 12 + 6) for i in range(40)]  # 6-gaps chain
    df2 = spark.createDataFrame(rows2, "chrom string, start long, end long")
    plain = _canon_merge(merge_intervals(df2, distance=6))
    assert plain == [("c", 0, 474, 40)]
    assert _canon_merge(merge_intervals(df2, distance=6, split_bp=50)) == plain
    with pytest.raises(ValueError, match="distance"):
        merge_intervals(df2, distance=50, split_bp=50)


def test_complement_with_sizes(spark):
    rows = [("c", 10, 20), ("c", 30, 40), ("e", 0, 100)]
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    out = sorted(tuple(r) for r in complement_intervals(
        df, sizes={"c": 50, "e": 100, "f": 25}).collect())
    assert out == [
        ("c", 0, 10), ("c", 20, 30), ("c", 40, 50),  # leading+mid+trailing
        ("f", 0, 25),                                 # fully uncovered
    ]  # 'e' covers [0,100) exactly: no gaps


def test_subtract_remove_any(spark):
    a = spark.createDataFrame(
        [(1, "c", 0, 100), (2, "c", 200, 300), (3, "d", 0, 50)],
        "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [("c", 90, 110)], "chrom string, start long, end long")
    out = sorted(r.a_id for r in subtract_intervals(
        a, b, bin_size=64, id_col="a_id", remove_any=True).collect())
    assert out == [2, 3]  # interval 1 dropped whole, columns intact
    cols = subtract_intervals(a, b, bin_size=64, id_col="a_id",
                              remove_any=True).columns
    assert cols == ["a_id", "chrom", "start", "end"]


def test_subtract_default_key_equals_id_col(frames):
    """The deterministic values-key default must produce exactly the
    keyed result (same segments, same multiset)."""
    a, b = frames
    keyed = sorted(map(tuple, subtract_intervals(
        a, b, bin_size=64, id_col="aid").collect()))
    plain = sorted(map(tuple, subtract_intervals(
        a, b, bin_size=64).collect()))
    assert plain == keyed


def test_subtract_default_key_duplicates(spark):
    """Duplicate a-rows each survive independently — the distinct +
    multiplicity re-expansion restores exact row counts."""
    a = spark.createDataFrame(
        [("c", 0, 100)] * 3 + [("c", 300, 400)],
        "chrom string, start long, end long")
    b = spark.createDataFrame(
        [("c", 40, 60)], "chrom string, start long, end long")
    got = sorted(map(tuple, subtract_intervals(a, b, bin_size=64).collect()))
    assert got == sorted(
        [("c", 0, 40)] * 3 + [("c", 60, 100)] * 3 + [("c", 300, 400)])


def test_coverage_intervals_hand_case(spark):
    from oxbow_spark.operators.interval_ops import coverage_intervals

    a = spark.createDataFrame(
        [(1, "c", 0, 100), (2, "c", 200, 300), (3, "c", 400, 410),
         (4, "d", 0, 50), (5, "c", 0, 100)],  # 5 duplicates 1's interval
        "aid long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [("c", 10, 30), ("c", 20, 50),      # overlapping pair: union 10-50
         ("c", 90, 210),                    # spans a1 tail + a2 head
         ("d", 100, 200)],                  # no overlap with a4
        "chrom string, start long, end long")
    got = {r.aid: (r.n_overlaps, r.covered_bp, r.frac)
           for r in coverage_intervals(a, b, bin_size=64).collect()}
    # a1: features 10-30, 20-50, 90-210 -> count 3; union covers
    # [10,50)+[90,100) = 50 bp
    assert got[1] == (3, 50, 0.5)
    assert got[5] == got[1]                 # duplicate values, same row
    assert got[2] == (1, 10, 0.1)           # [200,210) from 90-210
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_coverage_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import coverage_intervals

    rng = random.Random(17)
    a_rows = [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 2000),
               s + rng.randrange(1, 200)) for i in range(120)]
    b_rows = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 2000),
               s + rng.randrange(1, 150)) for _ in range(150)]
    a = spark.createDataFrame(
        a_rows, "aid long, chrom string, start long, end long")
    b = spark.createDataFrame(b_rows, "chrom string, start long, end long")
    got = {r.aid: (r.n_overlaps, r.covered_bp)
           for r in coverage_intervals(a, b, bin_size=128).collect()}
    for aid, ch, s, e in a_rows:
        feats = [(bs, be) for bc, bs, be in b_rows
                 if bc == ch and bs < e and be > s]
        covered = set()
        for bs, be in feats:
            covered.update(range(max(s, bs), min(e, be)))
        assert got[aid] == (len(feats), len(covered)), aid


def test_map_intervals_hand_case(spark):
    from oxbow_spark.operators.interval_ops import map_intervals

    a = spark.createDataFrame(
        [(1, "c", 0, 100), (2, "c", 200, 300), (3, "d", 0, 10)],
        "aid long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [("c", 10, 30, 5.0), ("c", 20, 50, 7.0), ("c", 250, 260, 1.0)],
        "chrom string, start long, end long, score double")
    got = {r.aid: r for r in map_intervals(
        a, b, bin_size=64, value_col="score").collect()}
    assert (got[1].map_count, got[1].map_sum, got[1].map_mean,
            got[1].map_min, got[1].map_max) == (2, 12.0, 6.0, 5.0, 7.0)
    assert got[2].map_count == 1 and got[2].map_sum == 1.0
    assert got[3].map_count == 0 and got[3].map_sum is None


def test_map_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import map_intervals

    rng = random.Random(29)
    a_rows = [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 1000),
               s + rng.randrange(1, 100)) for i in range(80)]
    b_rows = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 1000),
               s + rng.randrange(1, 80), float(rng.randrange(1, 50)))
              for _ in range(100)]
    a = spark.createDataFrame(
        a_rows, "aid long, chrom string, start long, end long")
    b = spark.createDataFrame(
        b_rows, "chrom string, start long, end long, score double")
    got = {r.aid: (r.map_count, r.map_sum)
           for r in map_intervals(a, b, bin_size=128, value_col="score",
                                  ops=("count", "sum")).collect()}
    for aid, ch, s, e in a_rows:
        vals = [v for bc, bs, be, v in b_rows
                if bc == ch and bs < e and be > s]
        assert got[aid] == (len(vals), sum(vals) if vals else None), aid


def test_slop_shift_flank(spark):
    from oxbow_spark.operators.interval_ops import (flank_intervals,
                                                    shift_intervals,
                                                    slop_intervals)

    df = spark.createDataFrame(
        [(1, "c", 10, 20), (2, "c", 0, 5), (3, "c", 95, 100)],
        "aid long, chrom string, start long, end long")
    sizes = {"c": 100}
    slop = {r.aid: (r.start, r.end) for r in slop_intervals(
        df, 8, sizes=sizes).collect()}
    assert slop[1] == (2, 28)
    assert slop[2] == (0, 13)       # left clamp at 0
    assert slop[3] == (87, 100)     # right clamp at size
    sh = {r.aid: (r.start, r.end) for r in shift_intervals(
        df, 10, sizes=sizes).collect()}
    assert sh[1] == (20, 30)
    assert sh[3] == (99, 100)       # bedtools clamp: shrinks at the edge
    shl = {r.aid: (r.start, r.end) for r in shift_intervals(
        df, -10, sizes=sizes).collect()}
    assert shl[2] == (0, 1)         # clamped at 0, >=1 bp survives
    fl = {(r.aid, r.side): (r.start, r.end) for r in flank_intervals(
        df, 5, sizes=sizes).collect()}
    assert fl[(1, "L")] == (5, 10) and fl[(1, "R")] == (20, 25)
    assert (2, "L") not in fl       # zero-width flank at chrom start
    assert fl[(3, "R")] == (100, 100) if (3, "R") in fl else True
    assert (3, "R") not in fl       # zero-width flank at chrom end


def _py_merge(rows):
    """Brute-force per-chrom merge (bookended intervals join) →
    {chrom: [(s, e)]}."""
    by = {}
    for ch, s, e in rows:
        by.setdefault(ch, []).append((s, e))
    out = {}
    for ch, iv in by.items():
        iv.sort()
        m = []
        for s, e in iv:
            if m and s <= m[-1][1]:
                m[-1] = (m[-1][0], max(m[-1][1], e))
            else:
                m.append((s, e))
        out[ch] = m
    return out


def test_jaccard_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import jaccard_intervals

    rng = random.Random(31)
    a_rows = [(f"c{rng.randrange(3)}", s := rng.randrange(0, 3000),
               s + rng.randrange(1, 250)) for _ in range(140)]
    b_rows = [(f"c{rng.randrange(3)}", s := rng.randrange(0, 3000),
               s + rng.randrange(1, 250)) for _ in range(110)]
    a = spark.createDataFrame(a_rows, "chrom string, start long, end long")
    b = spark.createDataFrame(b_rows, "chrom string, start long, end long")
    got = jaccard_intervals(a, b, bin_size=256).collect()[0]

    am, bm = _py_merge(a_rows), _py_merge(b_rows)
    la = sum(e - s for iv in am.values() for s, e in iv)
    lb = sum(e - s for iv in bm.values() for s, e in iv)
    ibp = n_int = 0
    for ch in set(am) & set(bm):
        for s1, e1 in am[ch]:
            for s2, e2 in bm[ch]:
                ov = min(e1, e2) - max(s1, s2)
                if ov > 0:
                    ibp += ov
                    n_int += 1
    assert (got.intersection_bp, got.union_bp, got.n_intersections) \
        == (ibp, la + lb - ibp, n_int)
    assert got.jaccard == ibp / (la + lb - ibp)


def test_jaccard_intervals_disjoint_sets(spark):
    from oxbow_spark.operators.interval_ops import jaccard_intervals

    a = spark.createDataFrame([("c", 0, 10)],
                              "chrom string, start long, end long")
    b = spark.createDataFrame([("d", 0, 10)],
                              "chrom string, start long, end long")
    got = jaccard_intervals(a, b, bin_size=64).collect()[0]
    assert (got.intersection_bp, got.union_bp, got.jaccard,
            got.n_intersections) == (0, 20, 0.0, 0)


def test_multiinter_intervals_hand_case(spark):
    from oxbow_spark.operators.interval_ops import multiinter_intervals

    s1 = spark.createDataFrame([("c", 0, 10), ("c", 20, 30)],
                               "chrom string, start long, end long")
    s2 = spark.createDataFrame([("c", 5, 25)],
                               "chrom string, start long, end long")
    got = {(r.chrom, r.start, r.end): (r.n_sets, r.set_list)
           for r in multiinter_intervals(
               {"x": s1, "y": s2}, bin_size=16).collect()}
    # boundaries 0,5,10,20,25,30 → elementary covered segments
    assert got == {
        ("c", 0, 5): (1, "x"),
        ("c", 5, 10): (2, "x,y"),
        ("c", 10, 20): (1, "y"),
        ("c", 20, 25): (2, "x,y"),
        ("c", 25, 30): (1, "x"),
    }


def test_multiinter_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import multiinter_intervals

    rng = random.Random(47)
    sets, rows = {}, {}
    for li in range(4):
        lab = f"s{li}"
        rows[lab] = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 1500),
                      s + rng.randrange(1, 180))
                     for _ in range(rng.randrange(20, 45))]
        sets[lab] = spark.createDataFrame(
            rows[lab], "chrom string, start long, end long")
    got = {(r.chrom, r.start, r.end): (r.n_sets, r.set_list)
           for r in multiinter_intervals(sets, bin_size=128).collect()}

    merged = {lab: _py_merge(rv) for lab, rv in rows.items()}
    expect = {}
    for ch in {c for m in merged.values() for c in m}:
        pts = sorted({p for m in merged.values()
                      for s, e in m.get(ch, []) for p in (s, e)})
        for ss, se in zip(pts, pts[1:]):
            labs = sorted(lab for lab, m in merged.items()
                          if any(s <= ss and e >= se
                                 for s, e in m.get(ch, [])))
            if labs:
                expect[(ch, ss, se)] = (len(labs), ",".join(labs))
    assert got == expect


def test_multiinter_split_bp_equals_plain(spark):
    """Chunked (split_bp) boundary lead-window ≡ plain for multiinter,
    incl. boundaries exactly on chunk edges and chunk-spanning blocks;
    plan guard: the boundary window keys on (chrom, chunk)."""
    import random

    from oxbow_spark.operators.interval_ops import multiinter_intervals

    rng = random.Random(59)
    sets = {}
    for li in range(3):
        rows = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 1500),
                 s + rng.choice([1, 7, 100, 128, 333, 900]))
                for _ in range(35)]
        rows += [("c0", 0, 1280), ("c1", 128, 256)]
        sets[f"s{li}"] = spark.createDataFrame(
            rows, "chrom string, start long, end long")
    plain = sorted(tuple(r) for r in multiinter_intervals(
        sets, bin_size=128).collect())
    for bp in (100, 128, 1 << 20):
        got = sorted(tuple(r) for r in multiinter_intervals(
            sets, bin_size=128, split_bp=bp).collect())
        assert got == plain, bp

    plan = multiinter_intervals(sets, bin_size=128, split_bp=128) \
        ._jdf.queryExecution().optimizedPlan().toString()
    w_specs = [ln for ln in plan.splitlines()
               if "windowspecdefinition" in ln and "_p#" in ln]
    assert w_specs and all("_k#" in ln for ln in w_specs), plan


def test_window_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import window_intervals

    rng = random.Random(59)
    a_rows = [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 2500),
               s + rng.randrange(1, 120)) for i in range(90)]
    b_rows = [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 2500),
               s + rng.randrange(1, 120)) for i in range(110)]
    a = spark.createDataFrame(
        a_rows, "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        b_rows, "b_id long, chrom string, b_start long, b_end long")
    out = window_intervals(a, b, bin_size=128, left=70, right=40).collect()
    got = {(r.a_id, r.b_id) for r in out}
    coords = {(r.a_id, r.b_id): (r.start, r.end, r.b_start, r.b_end)
              for r in out}
    expect = set()
    for aid, ac, as_, ae in a_rows:
        ws, we = max(as_ - 70, 0), ae + 40
        for bid, bc, bs, be in b_rows:
            if bc == ac and bs < we and ws < be:
                expect.add((aid, bid))
    assert got == expect
    # a's ORIGINAL coordinates ride through, plus b's
    for aid, ac, as_, ae in a_rows:
        for bid, bc, bs, be in b_rows:
            if (aid, bid) in got:
                assert coords[(aid, bid)] == (as_, ae, bs, be)


def test_sizes_clamp_literal_vs_broadcast_equality(spark):
    """Above `_SIZES_LITERAL_MAX` contigs the clamp family switches from
    a literal WHEN-chain to a broadcast sizes join — value-identical on
    the exact same input (scaffold-assembly path), and the join really
    broadcasts (no 10^5-branch CASE in the plan)."""
    import random

    from oxbow_spark.operators import interval_ops as iv

    rng = random.Random(71)
    n_contigs = iv._SIZES_LITERAL_MAX + 36
    sizes = {f"scaf{i}": rng.randrange(50, 400) for i in range(n_contigs)}
    rows = []
    for i in range(400):
        ch = f"scaf{rng.randrange(n_contigs + 5)}"   # some not in sizes
        s = rng.randrange(0, 300)
        rows.append((i, ch, s, s + rng.randrange(1, 80)))
    df = spark.createDataFrame(
        rows, "aid long, chrom string, start long, end long")

    def snap(out, cols=("start", "end")):
        return sorted(tuple(r[c] for c in ("aid", "chrom", *cols))
                      for r in out.collect())

    # force the literal path on the same sizes table for the twin
    orig = iv._SIZES_LITERAL_MAX
    try:
        iv._SIZES_LITERAL_MAX = 10 ** 6
        slop_lit = snap(iv.slop_intervals(df, 25, 60, sizes=sizes))
        shift_lit = snap(iv.shift_intervals(df, 70, sizes=sizes))
        flank_lit = snap(iv.flank_intervals(df, 30, sizes=sizes),
                         ("side", "start", "end"))
    finally:
        iv._SIZES_LITERAL_MAX = orig

    slop_b = iv.slop_intervals(df, 25, 60, sizes=sizes)
    assert snap(slop_b) == slop_lit
    assert snap(iv.shift_intervals(df, 70, sizes=sizes)) == shift_lit
    assert snap(iv.flank_intervals(df, 30, sizes=sizes),
                ("side", "start", "end")) == flank_lit

    plan = slop_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CASE WHEN" not in plan, plan


def test_cluster_intervals_hand_case(spark):
    from oxbow_spark.operators.interval_ops import cluster_intervals

    df = spark.createDataFrame(
        [(1, "chr1", 1, 5), (2, "chr1", 5, 9), (3, "chr1", 3, 6),
         (4, "chr1", 20, 25), (5, "chr2", 1, 4), (6, "chr2", 30, 40)],
        "aid long, chrom string, start long, end long")
    got = {r.aid: r.cluster_id
           for r in cluster_intervals(df).collect()}
    # chrom asc, start asc run order: chr1 [1,9)=1, chr1 [20,25)=2,
    # chr2 [1,4)=3, chr2 [30,40)=4
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: 4}
    # distance merges the chr1 gap (9 -> 20 is 11 bp)
    got_d = {r.aid: r.cluster_id
             for r in cluster_intervals(df, distance=11).collect()}
    assert got_d == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 3}


def _py_cluster(rows):
    """Brute-force global cluster ids in (chrom, start) order:
    rows = [(id, chrom, s, e)] -> {id: cluster_id}."""
    merged = _py_merge([(c, s, e) for _, c, s, e in rows])
    runs = []
    for ch in sorted(merged):
        for s, e in merged[ch]:
            runs.append((ch, s, e))
    out = {}
    for rid, c, s, e in rows:
        for i, (ch, rs, re_) in enumerate(runs):
            if ch == c and rs <= s and e <= re_:
                out[rid] = i + 1
                break
    return out


def test_cluster_intervals_random_vs_python(spark):
    import random

    from oxbow_spark.operators.interval_ops import cluster_intervals

    rng = random.Random(61)
    rows = [(i, f"c{rng.randrange(3)}", s := rng.randrange(0, 1500),
             s + rng.randrange(1, 200)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "aid long, chrom string, start long, end long")
    expect = _py_cluster(rows)
    got = {r.aid: r.cluster_id for r in cluster_intervals(df).collect()}
    assert got == expect
    # chunked run construction is invisible in the ids
    for bp in (128, 500, 1 << 20):
        chunked = {r.aid: r.cluster_id
                   for r in cluster_intervals(df, split_bp=bp).collect()}
        assert chunked == expect, bp


def test_make_windows_hand_and_property(spark):
    from oxbow_spark.operators.interval_ops import make_windows

    sizes = {"chr1": 2500, "chr2": 999, "chrM": 0}
    for window, step, fanout in ((1000, None, 1 << 22), (1000, 700, 1024),
                                 (250, 250, 512), (300, 100, 700)):
        st = step or window
        got = sorted(
            (r.chrom, r.start, r.end, r.win_id)
            for r in make_windows(spark, sizes, window, step,
                                  fanout_bp=fanout).collect())
        expect = sorted(
            (ch, s, min(s + window, ln), s // st + 1)
            for ch, ln in sizes.items()
            for s in range(0, ln, st))
        assert got == expect, (window, step, fanout)


def test_spacing_intervals_hand_case(spark):
    from oxbow_spark.operators.interval_ops import spacing_intervals

    df = spark.createDataFrame(
        [("chr1", 0, 10), ("chr1", 10, 20), ("chr1", 15, 30),
         ("chr1", 50, 60), ("chr2", 5, 8)],
        "chrom string, start long, end long")
    got = {(r.chrom, r.start): r.spacing
           for r in spacing_intervals(df).collect()}
    # first per chrom: null; bookend: 0; overlap clamps to 0; gap: 20
    assert got == {("chr1", 0): None, ("chr1", 10): 0, ("chr1", 15): 0,
                   ("chr1", 50): 20, ("chr2", 5): None}


def test_reldist_intervals_random_vs_python(spark):
    import math
    import random

    from oxbow_spark.operators.interval_ops import reldist_intervals

    rng = random.Random(71)
    a_rows = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 2000),
               s + rng.randrange(1, 120)) for _ in range(150)]
    b_rows = [(f"c{rng.randrange(2)}", s := rng.randrange(0, 2000),
               s + rng.randrange(1, 120)) for _ in range(40)]
    a = spark.createDataFrame(a_rows, "chrom string, start long, end long")
    b = spark.createDataFrame(b_rows, "chrom string, start long, end long")

    bmids = {}
    for ch, s, e in b_rows:
        bmids.setdefault(ch, set()).add((s + e) // 2)
    scores = []
    for ch, s, e in a_rows:
        mids = sorted(bmids.get(ch, ()))
        m = (s + e) // 2
        prev = max((x for x in mids if x <= m), default=None)
        nxt = min((x for x in mids if x >= m), default=None)
        if prev is None or nxt is None:
            continue
        scores.append(0.0 if nxt == prev
                      else min(m - prev, nxt - m) / (nxt - prev))
    expect_hist = {}
    for sc in scores:
        b_ = math.floor(sc * 100) / 100.0
        expect_hist[b_] = expect_hist.get(b_, 0) + 1
    total = sum(expect_hist.values())

    raw = sorted(r.reldist for r in
                 reldist_intervals(a, b, raw=True).collect())
    assert raw == pytest.approx(sorted(scores))
    got = {r.reldist: (r["count"], r.total, r.frac)
           for r in reldist_intervals(a, b).collect()}
    assert got == {k: (v, total, pytest.approx(v / total))
                   for k, v in expect_hist.items()}


def test_shuffle_intervals_properties(spark):
    import hashlib

    from oxbow_spark.operators.interval_ops import shuffle_intervals

    sizes = {"chr1": 1000, "chr2": 50}
    rows = [(1, "chr1", 100, 200), (2, "chr1", 100, 200),
            (3, "chr1", 0, 37), (4, "chr2", 10, 20),
            (5, "chr2", 0, 80),      # longer than chr2: pins to 0
            (6, "chrX", 5, 9)]       # not in sizes: dropped
    df = spark.createDataFrame(
        rows, "aid long, chrom string, start long, end long")

    def expect_start(ch, s, e, seed="", rid=None):
        ln, size = e - s, sizes[ch]
        if ln >= size:
            return 0
        key = f"{seed}{ch}:{s}-{e}" + (f"#{rid}" if rid is not None else "")
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return h % (size - ln + 1)

    got = {r.aid: (r.chrom, r.start, r.end)
           for r in shuffle_intervals(df, sizes).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for rid, ch, s, e in rows[:5]:
        ns = expect_start(ch, s, e)
        assert got[rid] == (ch, ns, ns + (e - s)), rid
    # identical rows co-place without id_col, decorrelate with it
    assert got[1] == got[2]
    with_id = {r.aid: r.start
               for r in shuffle_intervals(df, sizes,
                                          id_col="aid").collect()}
    assert with_id[1] == expect_start("chr1", 100, 200, rid=1)
    assert with_id[2] == expect_start("chr1", 100, 200, rid=2)
    # placement always fits; length preserved
    for rid, (ch, ns, ne) in got.items():
        assert 0 <= ns and ne <= max(sizes[ch], ne - ns)
    # seeded draws differ
    seeded = {r.aid: r.start
              for r in shuffle_intervals(df, sizes, seed="s1").collect()}
    assert seeded[1] == expect_start("chr1", 100, 200, seed="s1")


def test_closest_reldist_split_bp_equals_plain(spark):
    """Chunked (split_bp) as-of passes inside closest/reldist are
    bit-identical to the plain windows across chunk widths (incl.
    width 1: every boundary its own chunk)."""
    import random

    from oxbow_spark.operators.interval_ops import (closest_intervals,
                                                    reldist_intervals)

    rng = random.Random(113)
    a = spark.createDataFrame(
        [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 3000),
          s + rng.randrange(1, 150)) for i in range(80)],
        "a_id long, chrom string, start long, end long")
    b = spark.createDataFrame(
        [(1000 + i, f"c{rng.randrange(2)}", s := rng.randrange(0, 3000),
          s + rng.randrange(1, 150)) for i in range(50)],
        "b_id long, chrom string, start long, end long")
    plain_c = sorted(tuple(r) for r in
                     closest_intervals(a, b, bin_size=256).collect())
    plain_r = sorted(tuple(r) for r in reldist_intervals(a, b).collect())
    for bp in (1, 97, 256, 1 << 20):
        got_c = sorted(tuple(r) for r in closest_intervals(
            a, b, bin_size=256, split_bp=bp).collect())
        assert got_c == plain_c, bp
        got_r = sorted(tuple(r) for r in reldist_intervals(
            a, b, split_bp=bp).collect())
        assert got_r == plain_r, bp


def test_spacing_split_bp_equals_plain(spark):
    import random

    from oxbow_spark.operators.interval_ops import spacing_intervals

    rng = random.Random(127)
    rows = [(f"c{rng.randrange(3)}", s := rng.randrange(0, 2000),
             s + rng.randrange(1, 150)) for _ in range(150)]
    rows += [("c0", 0, 5), ("c0", 512, 600), ("c0", 1024, 1024 + 7)]
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    plain = sorted((r.chrom, r.start, r.end,
                    -1 if r.spacing is None else r.spacing)
                   for r in spacing_intervals(df).collect())
    for bp in (1, 97, 512, 1 << 20):
        got = sorted((r.chrom, r.start, r.end,
                      -1 if r.spacing is None else r.spacing)
                     for r in spacing_intervals(df, split_bp=bp).collect())
        assert got == plain, bp


def test_annotate_intervals_vs_coverage(spark):
    from oxbow_spark.operators.interval_ops import (annotate_intervals,
                                                    coverage_intervals)

    a = spark.createDataFrame(
        [(1, "c1", 0, 100), (2, "c1", 200, 300), (3, "c2", 0, 50)],
        "aid long, chrom string, start long, end long")
    sets = {
        "genes": spark.createDataFrame(
            [("c1", 10, 60), ("c1", 40, 80), ("c2", 0, 50)],
            "chrom string, start long, end long"),
        "repeats": spark.createDataFrame(
            [("c1", 250, 260), ("c1", 255, 290)],
            "chrom string, start long, end long"),
    }
    got = {r.aid: (r.genes_frac, r.genes_n, r.repeats_frac, r.repeats_n)
           for r in annotate_intervals(a, sets, bin_size=64,
                                       counts=True).collect()}
    # hand math: a1 covered by genes union [10,80) = 70/100; 2 overlaps
    assert got[1] == (0.70, 2, 0.0, 0)
    # a2 repeats union [250,290) = 40/100
    assert got[2] == (0.0, 0, 0.40, 2)
    assert got[3] == (1.0, 1, 0.0, 0)
    # agreement with coverage_intervals per set
    cov = {(r.chrom, r.start): r.frac for r in coverage_intervals(
        a.select("chrom", "start", "end"), sets["genes"],
        bin_size=64).collect()}
    for r in annotate_intervals(a, sets, bin_size=64).collect():
        assert r.genes_frac == cov[(r.chrom, r.start)]


def test_complement_split_bp_equals_plain_random(spark):
    """Chunked complement ≡ plain across chunk widths — random dense
    layouts on one hot key (adjacent, spanning, chunk-edge-aligned
    intervals), with and without `sizes` (leading/trailing gaps and
    fully-uncovered chroms)."""
    import random

    rng = random.Random(11)
    rows = []
    for chrom in ("hot", "cold"):
        n = 120 if chrom == "hot" else 6
        for _ in range(n):
            s = rng.randrange(0, 3000)
            rows.append((chrom, s, s + rng.randrange(1, 200)))
    rows += [("hot", 512, 1024), ("hot", 1024, 1030)]  # chunk-edge abut
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    sizes = {"hot": 5000, "cold": 4000, "untouched": 77}

    plain = sorted(tuple(r) for r in complement_intervals(df).collect())
    plain_sz = sorted(tuple(r) for r in
                      complement_intervals(df, sizes=sizes).collect())
    assert ("untouched", 0, 77) in plain_sz
    for bp in (1, 64, 512, 1 << 20):
        got = sorted(tuple(r) for r in
                     complement_intervals(df, split_bp=bp).collect())
        assert got == plain, bp
        got_sz = sorted(tuple(r) for r in complement_intervals(
            df, split_bp=bp, sizes=sizes).collect())
        assert got_sz == plain_sz, bp


def test_complement_split_bp_plan_windows_on_chunk(spark):
    """Plan guard: with split_bp, no window over corpus-scale rows may
    key on the bare contig — the lag keys on (chrom, chunk); only the
    tiny per-chunk summary window keys on chrom alone."""
    df = spark.createDataFrame([("c", 0, 10), ("c", 20, 30)],
                               "chrom string, start long, end long")
    plan = complement_intervals(df, split_bp=64)._jdf \
        .queryExecution().optimizedPlan().toString()
    specs = [ln for ln in plan.splitlines()
             if "windowspecdefinition" in ln]
    lag_lines = [ln for ln in specs if "lag(" in ln]
    assert lag_lines and all("_k#" in ln for ln in lag_lines), plan


def test_split_bp_call_sites_skip_default_estimator(spark, monkeypatch):
    """The internal asof_join(split_on=...) call sites (closest /
    cluster / reldist) must decide the carry stitch from the CHEAP
    scan-side projections (`estimate_broadcast_carry`), never via the
    per-call default — that default is an eager job over the derived
    prev_b/next_b/numbered/prev lineages and would re-execute them at
    plan time (ADVICE r12). Guard: the default estimator is poisoned;
    every split_bp path must still construct AND return split-equals-
    plain results."""
    import oxbow_spark.operators.asof as asof_mod
    from oxbow_spark.operators.interval_ops import (
        closest_intervals, cluster_intervals, reldist_intervals)

    def boom(*a, **k):  # pragma: no cover - the guard itself
        raise AssertionError(
            "asof_join default broadcast_carry estimator reached from "
            "an interval_ops internal call site")

    monkeypatch.setattr(asof_mod, "_carry_fits_broadcast", boom)

    a = spark.createDataFrame(
        [("c1", 10, 20, "a1"), ("c1", 100, 140, "a2"),
         ("c2", 5, 9, "a3")],
        "chrom string, start long, end long, name string")
    b = spark.createDataFrame(
        [("c1", 0, 4, "b1"), ("c1", 30, 35, "b2"), ("c1", 220, 230, "b3"),
         ("c2", 50, 60, "b4")],
        "chrom string, start long, end long, name string")

    c_plain = sorted(map(tuple, closest_intervals(
        a, b, bin_size=64, a_id="name", b_id="name").collect()))
    c_split = sorted(map(tuple, closest_intervals(
        a, b, bin_size=64, a_id="name", b_id="name", split_bp=16)
        .collect()))
    assert c_plain == c_split and c_plain
    k_plain = sorted(map(tuple, cluster_intervals(a).collect()))
    k_split = sorted(map(tuple, cluster_intervals(a, split_bp=16)
                         .collect()))
    assert k_plain == k_split and k_plain
    r_plain = sorted(map(tuple, reldist_intervals(a, b).collect()))
    r_split = sorted(map(tuple, reldist_intervals(a, b, split_bp=16)
                         .collect()))
    assert r_plain == r_split and r_plain
