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
    arrays or any null allele index) are excluded from every count."""
    al = F.col(alleles_col)
    called = F.filter(
        al, lambda g: g.isNotNull() & ~F.exists(g, lambda a: a.isNull()))
    flat = F.flatten(called)
    an = F.size(flat)
    n_alt = F.size(F.col("alt"))
    ac = F.transform(
        F.sequence(F.lit(1), F.greatest(n_alt, F.lit(1))),
        lambda i: F.size(F.filter(flat, lambda a: a == i)))
    ac = F.when(n_alt >= 1, ac).otherwise(F.array().cast("array<int>"))
    af = F.transform(
        ac, lambda c: F.when(an > 0, c.cast("double") / an))

    n_called = F.size(called)
    n_het = F.size(F.filter(
        called, lambda g: F.size(F.array_distinct(g)) > 1))
    n_hom_ref = F.size(F.filter(
        called,
        lambda g: (F.size(F.array_distinct(g)) == 1) & (g[0] == 0)))
    n_hom_alt = F.size(F.filter(
        called,
        lambda g: (F.size(F.array_distinct(g)) == 1) & (g[0] > 0)))

    # biallelic diploid HWE: p = ref freq, q = alt freq over 2N alleles;
    # expected (p², 2pq, q²)·N vs observed (hom_ref, het, hom_alt)
    diploid = F.forall(called, lambda g: F.size(g) == 2)
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
