"""Variant normalization: vt/bcftools-norm reference cases (repeat-tract
left-alignment, parsimony trimming, SNP/symbolic passthrough), both
driver math and the Spark mapInPandas path."""

from __future__ import annotations

import pytest

from oxbow_spark.operators.variant_norm import normalize_one, normalize_variants

#          0123456789012345678
CONTIG = "GGGCACACACAGGGTTTTA"  # CA-repeat from pos 3..10


def test_deletion_left_aligns_through_repeat():
    # del of 'CA' written at the right end of the tract: pos 8 (0-based),
    # REF='ACA' ALT='A' -> canonical: pos 2, REF='GCA' ALT='G'
    pos, ref, alts, changed = normalize_one(8, "ACA", ["A"], CONTIG)
    assert changed
    assert (pos, ref, alts) == (2, "GCA", ["G"])


def test_insertion_left_aligns():
    # ins of 'CA' at the right of the tract: pos 10 REF='A' ALT='ACA'
    pos, ref, alts, changed = normalize_one(10, "A", ["ACA"], CONTIG)
    assert changed
    assert (pos, ref, alts) == (2, "G", ["GCA"])


def test_parsimony_trims_both_ends():
    # over-specified SNP: REF='GCAC' ALT='GCTC' at pos 2 -> pos 4 A>T
    pos, ref, alts, changed = normalize_one(2, "GCAC", ["GCTC"], CONTIG)
    assert changed
    assert (pos, ref, alts) == (4, "A", ["T"])


def test_snp_and_symbolic_untouched():
    assert normalize_one(5, "C", ["T"], CONTIG) == (5, "C", ["T"], False)
    assert normalize_one(5, "C", ["<DEL>"], CONTIG) == (5, "C", ["<DEL>"], False)
    assert normalize_one(5, "C", ["*"], CONTIG) == (5, "C", ["*"], False)


def test_multiallelic_shares_trim_only_when_common():
    # REF='CAC' alts 'C','CACAC' all end in C: trims to ('CA','','CACA')?
    # -> empties trigger left extension; canonical forms keep one anchor
    pos, ref, alts, changed = normalize_one(3, "CAC", ["C", "CACAC"], CONTIG)
    assert changed
    # both alts remain distinct from ref and share the anchor base
    assert ref[0] == alts[0][0] == alts[1][0]
    assert len({ref, *alts}) == 3
    # round-trip semantics: deletion of CA and insertion of CA
    assert len(ref) - len(alts[0]) == 2 and len(alts[1]) - len(ref) == 2


def test_contig_start_stops_cleanly():
    # tract reaching position 0: 'GGG...' del of G written at pos 1
    pos, ref, alts, changed = normalize_one(1, "GG", ["G"], CONTIG)
    assert (pos, ref) == (0, "GG") and alts == ["G"]


def test_spark_path_string_and_array_alts(spark):
    rows = [
        (1, "c1", 9, "ACA", "A"),      # 1-based pos 9 == 0-based 8
        (2, "c1", 6, "C", "T"),        # SNP untouched
        (3, "c1", 3, "GCAC", "GCTC"),  # parsimony
        (4, "c2", 9, "ACA", "A"),      # chrom not in reference: untouched
    ]
    df = spark.createDataFrame(
        rows, "rid long, chrom string, pos long, ref string, alt string")
    out = {r.rid: r for r in normalize_variants(
        df, {"c1": CONTIG}).collect()}
    assert (out[1].pos, out[1].ref, out[1].alt) == (3, "GCA", "G")
    assert out[1].normalized is True
    assert (out[2].pos, out[2].ref, out[2].alt) == (6, "C", "T")
    assert out[2].normalized is False
    assert (out[3].pos, out[3].ref, out[3].alt) == (5, "A", "T")
    assert out[4].normalized is False and out[4].pos == 9

    adf = spark.createDataFrame(
        [(1, "c1", 9, "ACA", ["A"])],
        "rid long, chrom string, pos long, ref string, alt array<string>")
    r = normalize_variants(adf, {"c1": CONTIG}).collect()[0]
    assert (r.pos, r.ref, list(r.alt)) == (3, "GCA", ["G"])


def test_plan_is_narrow(spark):
    df = spark.createDataFrame(
        [(1, "c1", 9, "ACA", "A")],
        "rid long, chrom string, pos long, ref string, alt string")
    plan = normalize_variants(df, {"c1": CONTIG})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
