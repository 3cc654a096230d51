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
