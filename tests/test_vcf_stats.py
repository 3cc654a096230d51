"""bcftools-stats SN panel (`operators/vcf_stats.py`)."""

from __future__ import annotations

import pytest

FIX = "/root/reference/fixtures"


def test_variant_stats_random_vs_python(spark):
    """SN counters vs a brute-force python twin over random variants
    covering every class: SNP ts/tv, MNP, ins/del, multiallelic (pure
    SNP and mixed), symbolic, no-ALT, and a site that is SNP+indel at
    once."""
    import random

    from oxbow_spark.operators.vcf_stats import variant_stats

    rng = random.Random(29)
    bases = "ACGT"
    rows = []
    for i in range(600):
        kind = rng.randrange(8)
        ref = rng.choice(bases)
        if kind == 0:        # ts snp
            alt = [{"A": "G", "G": "A", "C": "T", "T": "C"}[ref]]
        elif kind == 1:      # tv snp
            alt = [{"A": "C", "G": "T", "C": "A", "T": "G"}[ref]]
        elif kind == 2:      # ins
            alt = [ref + "TT"]
        elif kind == 3:      # del
            ref = ref + "AC"
            alt = [ref[0]]
        elif kind == 4:      # mnp
            ref = "AT"
            alt = ["GC"]
        elif kind == 5:      # multiallelic (snp+snp or snp+ins)
            alt = (["G", "T"] if ref == "A" else ["A", ref + "GG"])
        elif kind == 6:      # symbolic
            alt = ["<DEL>"]
        else:                # no-alt
            alt = []
        rows.append((ref, alt))
    df = spark.createDataFrame(rows, "ref string, alt array<string>")
    r = variant_stats(df).collect()[0]

    TS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}

    def sym(a):
        return "<" in a or "*" in a

    def snp(ref, a):
        return len(ref) == 1 and len(a) == 1 and not sym(a) and a != ref

    exp = dict(n_records=len(rows), n_no_alts=0, n_snp_sites=0,
               n_mnp_sites=0, n_indel_sites=0, n_other_sites=0,
               n_multiallelic_sites=0, n_multiallelic_snp_sites=0,
               n_transitions=0, n_transversions=0, n_ins_alleles=0,
               n_del_alleles=0)
    for ref, alts in rows:
        if not alts:
            exp["n_no_alts"] += 1
        if len(alts) > 1:
            exp["n_multiallelic_sites"] += 1
            if all(snp(ref, a) for a in alts):
                exp["n_multiallelic_snp_sites"] += 1
        if any(snp(ref, a) for a in alts):
            exp["n_snp_sites"] += 1
        if any(not sym(a) and len(a) == len(ref) > 1 for a in alts):
            exp["n_mnp_sites"] += 1
        if any(not sym(a) and len(a) != len(ref) for a in alts):
            exp["n_indel_sites"] += 1
        if any(sym(a) for a in alts):
            exp["n_other_sites"] += 1
        for a in alts:
            if snp(ref, a):
                if (ref, a) in TS:
                    exp["n_transitions"] += 1
                else:
                    exp["n_transversions"] += 1
            if not sym(a) and len(a) > len(ref):
                exp["n_ins_alleles"] += 1
            if not sym(a) and len(a) < len(ref):
                exp["n_del_alleles"] += 1
    for k, v in exp.items():
        assert getattr(r, k) == v, (k, getattr(r, k), v)
    assert r.ts_tv == exp["n_transitions"] / exp["n_transversions"]


def test_variant_stats_on_vcf_fixture(spark):
    """The scanner's (ref, alt) columns feed straight in; spot-check
    against a per-row recount of the real fixture."""
    from oxbow_spark.operators.vcf_stats import variant_stats
    from oxbow_spark.sources import register_all

    register_all(spark)
    df = spark.read.format("vcf").load(f"{FIX}/sample.vcf")
    assert {"ref", "alt"} <= set(df.columns)
    r = variant_stats(df).collect()[0]
    rows = [(x.ref, list(x.alt or [])) for x in
            df.select("ref", "alt").collect()]
    assert r.n_records == len(rows)
    n_snp = sum(1 for ref, alts in rows
                if any(len(ref) == 1 and len(a) == 1 and a != ref
                       and "<" not in a and "*" not in a for a in alts))
    assert r.n_snp_sites == n_snp


def test_variant_stats_comma_string_alt(spark):
    from oxbow_spark.operators.vcf_stats import variant_stats

    df = spark.createDataFrame(
        [("A", "G,T"), ("C", "T"), ("G", ".")],
        "ref string, alt string")
    r = variant_stats(df).collect()[0]
    assert (r.n_records, r.n_multiallelic_sites, r.n_no_alts) == (3, 1, 1)
    assert r.n_transitions == 2 and r.n_transversions == 1
    assert r.ts_tv == pytest.approx(2.0)


def test_variant_isec_hand_case(spark):
    from oxbow_spark.operators.vcf_stats import (variant_isec,
                                                 variant_isec_summary)

    a = spark.createDataFrame(
        [("chr1", 100, "A", "G"), ("chr1", 100, "A", "G"),  # dup collapses
         ("chr1", 200, "C", "T"), ("chr2", 50, "G", "GA")],
        "chrom string, pos long, ref string, alt string")
    b = spark.createDataFrame(
        [("chr1", 100, "A", "G"),            # shared
         ("chr1", 200, "C", "A"),            # same pos, different alt
         ("chr3", 10, "T", "C")],
        "chrom string, pos long, ref string, alt string")
    got = {(r.chrom, r.pos, r.ref, r.alt): r.category
           for r in variant_isec(a, b).collect()}
    assert got == {
        ("chr1", 100, "A", "G"): "both",
        ("chr1", 200, "C", "T"): "a_only",
        ("chr2", 50, "G", "GA"): "a_only",
        ("chr1", 200, "C", "A"): "b_only",
        ("chr3", 10, "T", "C"): "b_only",
    }
    s = variant_isec_summary(a, b).collect()[0]
    assert (s.n_a, s.n_b, s.n_both, s.n_a_only, s.n_b_only) == (3, 3, 1, 2, 2)


def test_variant_isec_random_vs_python(spark):
    import random

    from oxbow_spark.operators.vcf_stats import variant_isec

    rng = random.Random(83)

    def mk(n):
        return [(f"chr{rng.randrange(3)}", rng.randrange(40),
                 rng.choice("ACGT"), rng.choice(["A", "T", "GG"]))
                for _ in range(n)]

    ra, rb = mk(120), mk(90)
    a = spark.createDataFrame(
        ra, "chrom string, pos long, ref string, alt string")
    b = spark.createDataFrame(
        rb, "chrom string, pos long, ref string, alt string")
    sa, sb = set(ra), set(rb)
    expect = {k: ("both" if k in sb else "a_only") for k in sa}
    expect.update({k: "b_only" for k in sb - sa})
    got = {(r.chrom, r.pos, r.ref, r.alt): r.category
           for r in variant_isec(a, b).collect()}
    assert got == expect
