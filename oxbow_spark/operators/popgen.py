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
