"""Population-genetics summaries over VCF/BCF genotype scans — the
allele-frequency / genotype-count / Hardy-Weinberg panel (`bcftools
+fill-tags` / `vcftools --hardy` family), as pure Catalyst
higher-order-function expressions over the scan's nested GT structs.

The reference (abdenlab/oxbow) scans genotypes and stops; this is the
first thing population workflows compute downstream. One narrow
Project per variant row — per-variant work is O(samples × ploidy)
inside codegen'd array lambdas, no explode, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def genotype_alleles(df: DataFrame, samples_col: str = "samples") -> Column:
    """array<array<int>> of per-sample GT allele indexes, built from the
    scan's ``samples`` struct (one sub-struct per sample; schema-driven,
    so any sample count works)."""
    names = [f.name for f in df.schema[samples_col].dataType.fields]
    return F.array(*[
        F.col(f"{samples_col}.{s}.GT.allele") for s in names
    ])


def allele_stats(df: DataFrame, alleles_col: str = "alleles",
                 key_cols: tuple[str, ...] = ("chrom", "pos", "ref", "alt"),
                 ) -> DataFrame:
    """Per-variant panel: AN (called alleles), AC/AF per alt allele,
    genotype counts (called / het / hom-ref / hom-alt), MAF, and the
    1-df Hardy-Weinberg chi-square for biallelic diploid sites (null
    elsewhere; bcftools convention). Missing genotypes (null allele
    arrays or any null allele index) are excluded from every count.

    LET-BOUND + staged (round 12): the called-genotype filter and its
    flatten bind to lambda variables once per row, and the whole panel
    is ONE staged struct column — HOF-bearing expressions are
    CodegenFallback (no whole-stage codegen, so no subexpression
    elimination), and the previous shape re-ran the O(samples) called
    filter once per metric (~6× per row); it also complies with the
    SCALE.md fact #5 audit rule (lambda bodies reference only lambda
    variables and scan-leaf attributes), so a downstream `.where` on
    any output column costs one extra panel evaluation, never a
    per-element re-scan."""
    al = F.col(alleles_col)
    n_alt = F.size(F.col("alt"))
    called = F.filter(
        al, lambda g: g.isNotNull() & ~F.exists(g, lambda a: a.isNull()))

    def _panel(cal, fl):
        an_b = F.size(fl)
        ac_b = F.when(n_alt >= 1, F.transform(
            F.sequence(F.lit(1), F.greatest(n_alt, F.lit(1))),
            lambda i: F.size(F.filter(fl, lambda a: a == i)))
        ).otherwise(F.array().cast("array<int>"))
        af_b = F.transform(
            ac_b, lambda c: F.when(F.size(fl) > 0,
                                   c.cast("double") / F.size(fl)))
        return F.struct(
            an_b.alias("an"),
            ac_b.alias("ac"),
            af_b.alias("af"),
            F.size(cal).alias("n_called"),
            F.size(F.filter(
                cal, lambda g: F.size(F.array_distinct(g)) > 1))
            .alias("n_het"),
            F.size(F.filter(
                cal,
                lambda g: (F.size(F.array_distinct(g)) == 1)
                & (g[0] == 0))).alias("n_hom_ref"),
            F.size(F.filter(
                cal,
                lambda g: (F.size(F.array_distinct(g)) == 1)
                & (g[0] > 0))).alias("n_hom_alt"),
            F.forall(cal, lambda g: F.size(g) == 2).alias("diploid"),
        )

    panel = F.element_at(F.transform(F.array(called), lambda cal:
        F.element_at(F.transform(F.array(F.flatten(cal)), lambda fl:
            _panel(cal, fl)), 1)), 1)

    df = df.withColumn("_pg", panel)
    pg = F.col("_pg")
    an, ac, af = pg["an"], pg["ac"], pg["af"]
    n_called = pg["n_called"]
    n_het = pg["n_het"]
    n_hom_ref = pg["n_hom_ref"]
    n_hom_alt = pg["n_hom_alt"]

    # biallelic diploid HWE: p = ref freq, q = alt freq over 2N alleles;
    # expected (p², 2pq, q²)·N vs observed (hom_ref, het, hom_alt)
    diploid = pg["diploid"]
    nn = n_called.cast("double")
    q = F.when(an > 0, F.element_at(ac, 1).cast("double") / an)
    p = F.lit(1.0) - q
    e_hr = p * p * nn
    e_het = 2 * p * q * nn
    e_ha = q * q * nn
    chi2 = (
        F.when(e_hr > 0, F.pow(n_hom_ref - e_hr, 2) / e_hr).otherwise(0.0)
        + F.when(e_het > 0, F.pow(n_het - e_het, 2) / e_het).otherwise(0.0)
        + F.when(e_ha > 0, F.pow(n_hom_alt - e_ha, 2) / e_ha).otherwise(0.0)
    )
    hwe = F.when((n_alt == 1) & diploid & (n_called > 0),
                 F.round(chi2, 6))
    maf = F.when(an > 0, F.round(
        F.least(q, F.lit(1.0) - q), 6))

    return df.select(
        *key_cols,
        an.alias("an"),
        ac.alias("ac"),
        F.transform(af, lambda x: F.round(x, 6)).alias("af"),
        n_called.alias("n_called"),
        n_het.alias("n_het"),
        n_hom_ref.alias("n_hom_ref"),
        n_hom_alt.alias("n_hom_alt"),
        F.when(n_alt == 1, maf).alias("maf"),
        hwe.alias("hwe_chi2"),
    )


def sample_qc(df: DataFrame, samples_col: str = "samples") -> DataFrame:
    """(sample, n_variants, n_called, call_rate, n_het, het_rate,
    n_hom_alt): per-sample cohort QC — missingness and heterozygosity,
    the first-pass sample filters of any association workflow. One
    posexplode over the (schema-enumerated) per-sample GT arrays + one
    hash agg keyed by sample index; cohort size changes the array
    width, not the plan."""
    names = [f.name for f in df.schema[samples_col].dataType.fields]
    gts = F.array(*[F.col(f"{samples_col}.{s}.GT.allele") for s in names])
    ex = df.select(F.posexplode(gts).alias("_si", "g"))
    called = F.col("g").isNotNull() & ~F.exists("g", lambda a: a.isNull())
    het = called & (F.size(F.array_distinct("g")) > 1)
    hom_alt = called & (F.size(F.array_distinct("g")) == 1) \
        & (F.col("g")[0] > 0)
    agg = ex.groupBy("_si").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum(called.cast("long")).alias("n_called"),
        F.sum(het.cast("long")).alias("n_het"),
        F.sum(hom_alt.cast("long")).alias("n_hom_alt"),
    )
    name_arr = F.array(*[F.lit(s) for s in names])
    return agg.select(
        F.element_at(name_arr, F.col("_si") + 1).alias("sample"),
        "n_variants", "n_called",
        F.round(F.col("n_called") / F.greatest("n_variants", F.lit(1)), 6)
        .alias("call_rate"),
        "n_het",
        F.round(F.col("n_het") / F.greatest("n_called", F.lit(1)), 6)
        .alias("het_rate"),
        "n_hom_alt",
    )


_TI = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}


def titv(df: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """(… , n_ti, n_tv, titv): transition/transversion counts over
    biallelic SNVs (ref and alt both single bases), optionally grouped
    by ``by`` columns (e.g. ('chrom',)) — the canonical callset QC
    ratio (~2.0-2.1 genome-wide for real human data; ~0.5 for random
    noise). Pure conditional aggregation."""
    snv = df.where(
        (F.length("ref") == 1) & (F.size("alt") == 1)
        & (F.length(F.element_at("alt", 1)) == 1))
    r = F.upper(F.col("ref"))
    a = F.upper(F.element_at("alt", 1))
    is_ti = F.lit(False)
    for x, y in sorted(_TI):
        is_ti = is_ti | ((r == x) & (a == y))
    acgt = r.isin("A", "C", "G", "T") & a.isin("A", "C", "G", "T") & (r != a)
    snv = snv.where(acgt)
    agg = snv.groupBy(*by).agg(
        F.sum(is_ti.cast("long")).alias("n_ti"),
        F.sum((~is_ti).cast("long")).alias("n_tv"),
    )
    return agg.select(
        *by, "n_ti", "n_tv",
        F.round(F.col("n_ti") / F.greatest("n_tv", F.lit(1)), 6)
        .alias("titv"))
