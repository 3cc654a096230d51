"""Property-based tests (hypothesis) for the pure-Python layers — region
grammar round-trips, coordinate shifts, rANS codec — plus seeded-random
batch checks for the Catalyst expression functions (one Spark collect per
property, not per example)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from oxbow_spark.coords import Region, start_offset
from oxbow_spark.sources.cram import rans4x8_decode
from tests.test_cram import _rans0_encode

NAMES = st.from_regex(r"chr[0-9XYM][0-9]?", fullmatch=True)


@given(NAMES, st.integers(0, 10**8), st.integers(1, 10**6))
def test_region_bracket_roundtrip(name, start, length):
    r = Region(name, start, start + length)
    r2 = Region.parse(str(r))
    assert (r2.name, r2.start, r2.end) == (r.name, r.start, r.end)


@given(NAMES, st.integers(1, 10**8), st.integers(1, 10**6))
def test_region_ucsc_vs_bracket(name, start1, length):
    """UCSC 1-based closed `chr:s-e` ≡ bracket `chr:[s,e]` ≡ half-open
    `chr:[s-1,e)` — all three spellings parse to the same region."""
    end1 = start1 + length - 1
    a = Region.parse(f"{name}:{start1}-{end1}", "11")
    b = Region.parse(f"{name}:[{start1},{end1}]")
    c = Region.parse(f"{name}:[{start1 - 1},{end1})")
    assert (a.start, a.end) == (b.start, b.end) == (c.start, c.end)


@given(NAMES, st.integers(1, 10**8), st.integers(1, 10**6))
def test_region_thousands_separators(name, start1, length):
    end1 = start1 + length - 1

    def sep(n: int) -> str:
        return f"{n:,}"

    a = Region.parse(f"{name}:{sep(start1)}-{sep(end1)}", "11")
    b = Region.parse(f"{name}:{start1}-{end1}", "11")
    assert (a.start, a.end) == (b.start, b.end)


@given(st.integers(0, 10**9))
def test_start_offset_roundtrip(pos):
    there = pos + start_offset("11", "01")
    back = there + start_offset("01", "11")
    assert back == pos
    assert start_offset("11", "11") == start_offset("01", "01") == 0


@given(NAMES, st.integers(0, 1000), st.integers(1, 100),
       st.integers(0, 1200), st.integers(1, 100))
def test_region_overlap_is_interval_intersection(name, s1, l1, s2, l2):
    r = Region(name, s1, s1 + l1)
    got = r.overlaps(s2, s2 + l2)
    expect = max(s1, s2) < min(s1 + l1, s2 + l2)
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=2000))
def test_rans4x8_roundtrip_random(data):
    assert rans4x8_decode(_rans0_encode(data)) == data


def test_cigar_functions_random_batch(spark):
    """Random CIGARs: expression-level ops/reflen/qlen/end agree with a
    direct Python evaluation (single batch, one collect)."""
    from pyspark.sql import functions as F

    from oxbow_spark.functions import genomics as G

    rng = random.Random(7)
    ref_ops, query_ops = set("MDN=X"), set("MIS=X")
    rows = []
    for i in range(300):
        n = rng.randint(1, 8)
        cig = "".join(
            f"{rng.randint(1, 99)}{rng.choice('MIDNSHP=X')}" for _ in range(n)
        )
        rows.append((i, rng.randint(1, 10**6), cig))
    df = spark.createDataFrame(rows, ["i", "pos", "cigar"]).select(
        "i", "pos", "cigar",
        G.cigar_reflen("cigar").alias("rl"),
        G.cigar_qlen("cigar").alias("ql"),
        G.alignment_end("pos", "cigar").alias("e"),
    )
    import re

    for r in df.collect():
        ops = [(int(m[0]), m[1]) for m in re.findall(r"(\d+)([MIDNSHP=X])", r.cigar)]
        rl = sum(n for n, o in ops if o in ref_ops)
        ql = sum(n for n, o in ops if o in query_ops)
        assert r.rl == rl and r.ql == ql, r.cigar
        assert r.e == r.pos + rl - 1


def test_phred_roundtrip_random_batch(spark):
    from oxbow_spark.functions import genomics as G

    rng = random.Random(11)
    rows = [(i, [rng.randint(0, 93) for _ in range(rng.randint(1, 80))])
            for i in range(200)]
    df = spark.createDataFrame(rows, ["i", "scores"]).select(
        "i", "scores",
        G.phred_to_scores(G.scores_to_phred("scores")).alias("rt"),
    )
    for r in df.collect():
        assert list(r.rt) == list(r.scores)
