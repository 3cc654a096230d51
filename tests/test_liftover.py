"""Chain-file liftover: parser block math, forward and reverse-strand
position/interval mapping, gap unmapped handling, broadcast plan."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.liftover import (
    chain_frame,
    liftover_intervals,
    liftover_positions,
    parse_chain,
)

# two chains: a forward one with an interior gap, and a reverse one.
# chain 1: src chrA [100, 160) aligned in two blocks:
#   [100,130) -> dst chrX [1000,1030); 10bp src gap / 5bp dst gap;
#   [140,160) -> dst chrX [1035,1055)
# chain 2: src chrB [50, 80) -> dst chrY strand '-', q_size 500,
#   strand-local q range [200, 230)
CHAIN_TEXT = """\
chain 1000 chrA 1000 + 100 160 chrX 2000 + 1000 1055 1
30 10 5
20

chain 900 chrB 600 + 50 80 chrY 500 - 200 230 2
30
"""


@pytest.fixture(scope="module")
def chains(spark):
    blocks = parse_chain(CHAIN_TEXT)
    return chain_frame(spark, blocks)


def test_parse_chain_blocks():
    blocks = parse_chain(CHAIN_TEXT)
    assert len(blocks) == 3
    b0, b1, b2 = blocks
    assert (b0.t_start, b0.t_end, b0.q_start) == (100, 130, 1000)
    assert (b1.t_start, b1.t_end, b1.q_start) == (140, 160, 1035)
    assert b1.chain_id == 1
    assert (b2.t_chrom, b2.q_strand, b2.q_start, b2.q_size) == (
        "chrB", "-", 200, 500)


def test_positions_forward_and_gap(spark, chains):
    df = spark.createDataFrame(
        [(1, "chrA", 100), (2, "chrA", 129), (3, "chrA", 135),
         (4, "chrA", 140), (5, "chrA", 159), (6, "chrA", 500),
         (7, "chrZ", 100)],
        "rid long, chrom string, pos long",
    )
    got = {r.rid: (r.new_chrom, r.new_pos)
           for r in liftover_positions(df, chains).collect()}
    assert got[1] == ("chrX", 1000)
    assert got[2] == ("chrX", 1029)
    assert got[3] == (None, None)        # in the src gap: unmapped
    assert got[4] == ("chrX", 1035)      # after the 10/5 gap
    assert got[5] == ("chrX", 1054)
    assert got[6] == (None, None)        # outside every chain
    assert got[7] == (None, None)        # unknown chrom


def test_positions_reverse_strand(spark, chains):
    df = spark.createDataFrame(
        [(1, "chrB", 50), (2, "chrB", 79)], "rid long, chrom string, pos long")
    got = {r.rid: (r.new_chrom, r.new_pos)
           for r in liftover_positions(df, chains).collect()}
    # strand-local q = 200 + (pos - 50); + coordinate = 500 - q - 1
    assert got[1] == ("chrY", 500 - 200 - 1)        # 299
    assert got[2] == ("chrY", 500 - 229 - 1)        # 270


def test_intervals(spark, chains):
    df = spark.createDataFrame(
        [(1, "chrA", 105, 125),    # inside fwd block
         (2, "chrA", 120, 145),    # spans the gap: unmapped (strict)
         (3, "chrB", 50, 80),      # whole reverse block
         (4, "chrB", 60, 70)],     # interior reverse
        "rid long, chrom string, start long, end long",
    )
    got = {r.rid: (r.new_chrom, r.new_start, r.new_end)
           for r in liftover_intervals(df, chains).collect()}
    assert got[1] == ("chrX", 1005, 1025)
    assert got[2] == (None, None, None)
    # chrB [50,80) -> strand-local [200,230) -> + coords [270, 300)
    assert got[3] == ("chrY", 270, 300)
    # [60,70) -> local [210,220) -> + coords [280, 290)
    assert got[4] == ("chrY", 280, 290)
    # half-open width is preserved under both strands
    assert got[3][2] - got[3][1] == 30 and got[4][2] - got[4][1] == 10


def test_broadcast_plan(spark, chains):
    df = spark.createDataFrame([(1, "chrA", 100)],
                               "rid long, chrom string, pos long")
    plan = liftover_positions(df, chains)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# overlapping chains: best-chain (max score, tie min chain_id) must win,
# one output row per input row — never one per matching chain
OVERLAP_TEXT = """\
chain 1000 chrA 1000 + 100 200 chrX 2000 + 1000 1100 1
100

chain 500 chrA 1000 + 150 260 chrW 3000 + 400 510 2
110

chain 500 chrA 1000 + 150 260 chrV 3000 + 700 810 9
110
"""


@pytest.fixture(scope="module")
def overlap_chains(spark):
    return chain_frame(spark, parse_chain(OVERLAP_TEXT))


def test_positions_best_chain(spark, overlap_chains):
    df = spark.createDataFrame(
        [(1, "chrA", 120),   # chain 1 only
         (2, "chrA", 160),   # chains 1, 2, 9 overlap: score 1000 wins
         (3, "chrA", 220),   # chains 2 and 9 (score tie): min id -> 2
         (4, "chrA", 300)],  # none
        "rid long, chrom string, pos long",
    )
    got = {r.rid: (r.new_chrom, r.new_pos, r.chain_id)
           for r in liftover_positions(df, overlap_chains).collect()}
    assert got[1] == ("chrX", 1020, 1)
    assert got[2] == ("chrX", 1060, 1)
    assert got[3] == ("chrW", 470, 2)
    assert got[4] == (None, None, None)
    # exactly one output row per input row
    assert liftover_positions(df, overlap_chains).count() == 4


def test_intervals_best_chain(spark, overlap_chains):
    df = spark.createDataFrame(
        [(1, "chrA", 160, 190),   # inside both nets: chain 1 wins
         (2, "chrA", 180, 230),   # spans past chain 1's block: 2 beats 9
         (3, "chrA", 120, 220)],  # contained by no single block
        "rid long, chrom string, start long, end long",
    )
    out = liftover_intervals(df, overlap_chains)
    got = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
           for r in out.collect()}
    assert got[1] == ("chrX", 1060, 1090, 1)
    assert got[2] == ("chrW", 430, 480, 2)
    assert got[3] == (None, None, None, None)
    assert out.count() == 3


# chain 3: forward two-block chain with an interior gap (for minMatch),
# chain 4: reverse two-block chain with an interior gap
MM_CHAIN_TEXT = CHAIN_TEXT + """\
chain 800 chrC 1000 + 100 160 chrW 2000 + 500 555 3
30 10 5
20

chain 700 chrD 1000 + 100 160 chrV 500 - 300 355 4
30 10 5
20
"""


@pytest.fixture(scope="module")
def mm_chains(spark):
    return chain_frame(spark, parse_chain(MM_CHAIN_TEXT))


def test_intervals_min_match_stitches_gaps(spark, mm_chains):
    df = spark.createDataFrame(
        [(1, "chrC", 105, 125),   # inside one block: same as strict
         (2, "chrC", 120, 145),   # straddles the gap: 15/25 = 0.6 mapped
         (3, "chrC", 128, 142),   # 2+2 of 14 mapped = 0.286
         (4, "chrD", 120, 145),   # reverse-strand straddle, 0.6
         (5, "chrC", 95, 125),    # hangs off the chain start: 25/30
         (6, "chrZ", 0, 10)],     # unknown chrom
        "rid long, chrom string, start long, end long")
    # strict: only rid 1 maps
    strict = {r.rid: r.new_chrom
              for r in liftover_intervals(df, mm_chains).collect()}
    assert strict[1] == "chrW" and strict[2] is None and strict[5] is None
    # minMatch 0.5: gap-straddlers map, spanning first->last mapped base
    got = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
           for r in liftover_intervals(
               df, mm_chains, min_match=0.5).collect()}
    assert got[1] == ("chrW", 505, 525, 3)
    # [120,145): q0=500+20=520, q1=535+(145-140)=540
    assert got[2] == ("chrW", 520, 540, 3)
    assert got[3] == (None, None, None, None)      # 4/14 < 0.5
    # chrD reverse: local q0=300+20=320, q1=335+5=340 -> flip on 500
    assert got[4] == ("chrV", 500 - 340, 500 - 320, 4)
    # [95,125): mapped [100,125) 25/30=0.83 -> q [500, 525)
    assert got[5] == ("chrW", 500, 525, 3)
    assert got[6] == (None, None, None, None)
    # minMatch 0.95 rejects the straddlers but keeps full-block rows
    tight = {r.rid: r.new_chrom for r in liftover_intervals(
        df, mm_chains, min_match=0.95).collect()}
    assert tight[1] == "chrW" and tight[2] is None and tight[5] is None


def test_intervals_min_match_id_col_fast_path(spark, mm_chains):
    df = spark.createDataFrame(
        [(1, "chrC", 105, 125), (2, "chrC", 120, 145), (3, "chrZ", 0, 5)],
        "rid long, chrom string, start long, end long")
    a = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
         for r in liftover_intervals(
             df, mm_chains, min_match=0.5, id_col="rid").collect()}
    b = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
         for r in liftover_intervals(
             df, mm_chains, min_match=0.5).collect()}
    assert a == b and a[2][0] == "chrW"


def test_intervals_min_match_duplicates_and_best_chain(spark, overlap_chains):
    """Duplicate rows each get an output row; overlapping chains pick
    max score / min chain_id, same as strict mode."""
    rows = [("chrA", 110, 130)] * 3
    df = spark.createDataFrame(rows, "chrom string, start long, end long")
    out = liftover_intervals(df, overlap_chains, min_match=0.9).collect()
    assert len(out) == 3
    assert len({(r.new_chrom, r.new_start, r.new_end, r.chain_id)
                for r in out}) == 1
    strict = liftover_intervals(df, overlap_chains).collect()
    assert ({(r.new_chrom, r.new_start, r.new_end, r.chain_id)
             for r in out}
            == {(r.new_chrom, r.new_start, r.new_end, r.chain_id)
                for r in strict})


def test_intervals_min_match_equals_strict_when_inside_blocks(spark, chains):
    """For intervals fully inside one block, minMatch at any threshold
    reproduces the strict mapping exactly."""
    df = spark.createDataFrame(
        [(1, "chrA", 105, 125), (2, "chrB", 60, 70), (3, "chrA", 135, 138)],
        "rid long, chrom string, start long, end long")
    want = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
            for r in liftover_intervals(df, chains).collect()}
    got = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
           for r in liftover_intervals(df, chains, min_match=1.0).collect()}
    # rid 3 sits in the src gap: unmapped both ways
    assert want[3] == (None, None, None, None)
    assert got == want


def test_intervals_min_match_random_vs_python(spark):
    """Randomized chains (gapped blocks, both strands, overlapping
    nets) x random intervals: the Spark minMatch mapper must equal a
    brute-force reference (overlap sums, threshold, first-to-last
    mapped-base span, best-chain by score/min-id)."""
    import random

    rng = random.Random(83)
    chains = []   # (chain_id, score, t_chrom, blocks=[(ts,te,qs)], strand, q_size)
    cid = 0
    for _ in range(6):
        cid += 1
        chrom = f"c{rng.randrange(2)}"
        strand = rng.choice("+-")
        t = rng.randrange(0, 5000)
        q = rng.randrange(0, 5000)
        blocks = []
        for _b in range(rng.randrange(1, 4)):
            size = rng.randrange(20, 400)
            blocks.append((t, t + size, q))
            gap_t = rng.randrange(1, 200)
            gap_q = rng.randrange(1, 200)
            t += size + gap_t
            q += size + gap_q
        chains.append((cid, rng.randrange(50, 2000), chrom, blocks,
                       strand, 1 << 20))
    text = ""
    for cid, score, chrom, blocks, strand, qsz in chains:
        t0, tN = blocks[0][0], blocks[-1][1]
        q0 = blocks[0][2]
        qN = blocks[-1][2] + (blocks[-1][1] - blocks[-1][0])
        text += (f"chain {score} {chrom} {1 << 21} + {t0} {tN} "
                 f"q_{cid} {qsz} {strand} {q0} {qN} {cid}\n")
        for i, (ts, te, _qs) in enumerate(blocks):
            if i + 1 < len(blocks):
                nts = blocks[i + 1][0]
                nqs = blocks[i + 1][2]
                text += (f"{te - ts} {nts - te} "
                         f"{nqs - (_qs + te - ts)}\n")
            else:
                text += f"{te - ts}\n\n"
    cf = chain_frame(spark, parse_chain(text))
    ivs = [(i, f"c{rng.randrange(2)}", s := rng.randrange(0, 6000),
            s + rng.randrange(10, 600)) for i in range(150)]
    df = spark.createDataFrame(
        ivs, "rid long, chrom string, start long, end long")
    mm = 0.6
    got = {r.rid: (r.new_chrom, r.new_start, r.new_end, r.chain_id)
           for r in liftover_intervals(df, cf, min_match=mm).collect()}

    def brute(chrom, s, e):
        best = None
        for cid, score, tch, blocks, strand, qsz in chains:
            if tch != chrom:
                continue
            ov = [(max(s, ts), min(e, te), ts, qs)
                  for ts, te, qs in blocks if max(s, ts) < min(e, te)]
            mapped = sum(b - a for a, b, _t, _q in ov)
            if not ov or mapped / (e - s) < mm:
                continue
            a0, _b0, t0, q0s = min(ov, key=lambda x: x[2])
            _a1, b1, t1, q1s = max(ov, key=lambda x: x[2])
            lo = q0s + (a0 - t0)
            hi = q1s + (b1 - t1)
            if strand == "-":
                lo, hi = qsz - hi, qsz - lo
            cand = (score, -cid, f"q_{cid}", lo, hi, cid)
            if best is None or cand > best:
                best = cand
        if best is None:
            return (None, None, None, None)
        return best[2], best[3], best[4], best[5]

    for rid, chrom, s, e in ivs:
        assert got[rid] == brute(chrom, s, e), (rid, chrom, s, e)
