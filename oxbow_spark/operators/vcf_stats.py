"""bcftools-stats SN panel: site/allele classification counters.

The third most-run variant triage tool (after flagstat/idxstats on the
alignment side): `bcftools stats` opens with the SN block — record,
SNP/MNP/indel/other site counts, multiallelic site counts — and the
ts/tv line. The reference scans VCF/BCF columns
(`oxbow/src/variant/…`) and leaves counting to downstream engines;
this is that downstream counting as ONE conditional aggregation.

Counting conventions (bcftools semantics, documented not guessed):
- site-level classes count a site once per class it contains ≥1 allele
  of (a site can be both SNP and indel); `others` = symbolic alleles
  (`<…>`, `*`);
- `no_alts` = sites whose ALT set is empty (`.`);
- multiallelic = >1 ALT allele; multiallelic SNP sites = >1 ALT and
  every ALT a SNP;
- transitions/transversions count per ALT ALLELE (A↔G / C↔T are ts);
  `ts_tv` divides the exact long counters, so any engine reproduces
  the double bit-identically.

Plan: pure Project over the row's own (ref, alt-array) via array
higher-order functions — no explode, no shuffle — then a single-row
conditional agg (map-side combined). Scan speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def variant_stats(df: DataFrame, ref_col: str = "ref",
                  alt_col: str = "alt") -> DataFrame:
    """Single-row SN panel over a variants frame. ``alt_col`` may be
    ``array<string>`` (the VCF/BCF scanners' shape) or a comma-joined
    string; empty / ``.`` entries mean no-ALT."""
    alt_t = dict(df.dtypes)[alt_col]
    alts0 = (F.col(alt_col) if alt_t.startswith("array")
             else F.split(F.col(alt_col), ","))
    staged = df.select(
        F.upper(F.col(ref_col)).alias("_r"),
        F.filter(
            F.coalesce(alts0, F.array().cast("array<string>")),
            lambda a: (a != "") & (a != ".")).alias("_a"),
    )
    r = F.col("_r")

    def sym(a):
        return a.contains("<") | a.contains("*")

    def is_snp(a):
        return (F.length(r) == 1) & (F.length(a) == 1) & ~sym(a) & (a != r)

    def is_mnp(a):
        return ~sym(a) & (F.length(a) == F.length(r)) & (F.length(r) > 1)

    def is_ins(a):
        return ~sym(a) & (F.length(a) > F.length(r))

    def is_del(a):
        return ~sym(a) & (F.length(a) < F.length(r))

    def is_ts(a):
        return is_snp(a) & (
            ((r == "A") & (a == "G")) | ((r == "G") & (a == "A"))
            | ((r == "C") & (a == "T")) | ((r == "T") & (a == "C")))

    def cnt(pred):
        return F.size(F.filter(F.col("_a"), pred))

    per = staged.select(
        (F.size("_a") == 0).cast("long").alias("_noalt"),
        (F.size("_a") > 1).cast("long").alias("_multi"),
        ((F.size("_a") > 1) & (cnt(is_snp) == F.size("_a")))
        .cast("long").alias("_multisnp"),
        (cnt(is_snp) > 0).cast("long").alias("_snp"),
        (cnt(is_mnp) > 0).cast("long").alias("_mnp"),
        ((cnt(is_ins) + cnt(is_del)) > 0).cast("long").alias("_indel"),
        (cnt(sym) > 0).cast("long").alias("_other"),
        cnt(is_ts).cast("long").alias("_ts"),
        (cnt(is_snp) - cnt(is_ts)).cast("long").alias("_tv"),
        cnt(is_ins).cast("long").alias("_ins"),
        cnt(is_del).cast("long").alias("_del"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum("_noalt").cast("long").alias("n_no_alts"),
        F.sum("_snp").cast("long").alias("n_snp_sites"),
        F.sum("_mnp").cast("long").alias("n_mnp_sites"),
        F.sum("_indel").cast("long").alias("n_indel_sites"),
        F.sum("_other").cast("long").alias("n_other_sites"),
        F.sum("_multi").cast("long").alias("n_multiallelic_sites"),
        F.sum("_multisnp").cast("long").alias("n_multiallelic_snp_sites"),
        F.sum("_ts").cast("long").alias("n_transitions"),
        F.sum("_tv").cast("long").alias("n_transversions"),
        F.sum("_ins").cast("long").alias("n_ins_alleles"),
        F.sum("_del").cast("long").alias("n_del_alleles"),
    )
    return agg.withColumn(
        "ts_tv",
        F.when(F.col("n_transversions") > 0,
               F.col("n_transitions").cast("double")
               / F.col("n_transversions").cast("double")))


def variant_isec(a: DataFrame, b: DataFrame,
                 key_cols: tuple[str, ...] = ("chrom", "pos", "ref", "alt"),
                 ) -> DataFrame:
    """bcftools-isec site membership (``bcftools isec -c none``: exact
    key match): per DISTINCT site key, which callsets contain it —
    ``(*key_cols, in_a, in_b, category)`` with category
    'a_only' / 'b_only' / 'both'. Callers with array ALTs explode
    first (bcftools compares the record's allele set; per-allele isec
    is the exploded form of the same join).

    Plan: distinct per side (map-side partial agg), then ONE full-outer
    sort-merge join on the key — both sides shuffle once on the same
    key, no broadcast assumption (callsets are usually the same
    magnitude). Reference capability: set operations its users run via
    `bcftools isec` downstream of the VCF/BCF scans
    (/root/reference/oxbow/src/variant/); the reference engine itself
    has no join operators (py-oxbow/oxbow/_pyarrow.py:738-774)."""
    keys = list(key_cols)
    da = a.select(*keys).distinct().withColumn("_ia", F.lit(1))
    db = b.select(*keys).distinct().withColumn("_ib", F.lit(1))
    j = da.join(db, keys, "full_outer")
    in_a = F.col("_ia").isNotNull()
    in_b = F.col("_ib").isNotNull()
    return j.select(
        *keys,
        in_a.alias("in_a"), in_b.alias("in_b"),
        F.when(in_a & in_b, F.lit("both"))
        .when(in_a, F.lit("a_only"))
        .otherwise(F.lit("b_only")).alias("category"),
    )


def variant_isec_summary(
    a: DataFrame, b: DataFrame,
    key_cols: tuple[str, ...] = ("chrom", "pos", "ref", "alt"),
) -> DataFrame:
    """One-row bcftools-isec panel over distinct site keys: ``n_a`` /
    ``n_b`` (distinct sites per callset), ``n_both`` (shared),
    ``n_a_only`` / ``n_b_only`` (private). Same single full-outer
    join as `variant_isec` + one map-side-combined agg."""
    return variant_isec(a, b, key_cols).agg(
        F.sum(F.col("in_a").cast("long")).cast("long").alias("n_a"),
        F.sum(F.col("in_b").cast("long")).cast("long").alias("n_b"),
        F.sum((F.col("category") == "both").cast("long"))
        .cast("long").alias("n_both"),
        F.sum((F.col("category") == "a_only").cast("long"))
        .cast("long").alias("n_a_only"),
        F.sum((F.col("category") == "b_only").cast("long"))
        .cast("long").alias("n_b_only"),
    )


def merge_callsets(
    sets: dict[str, DataFrame],
    key_cols: tuple[str, ...] = ("chrom", "pos", "ref", "alt"),
    gt_col: str = "gt",
) -> DataFrame:
    """bcftools-merge (``-m none`` exact-key flavor) over N labelled
    single-sample callsets: one row per DISTINCT site key with
    ``gts`` — a map from callset label to its genotype (absent
    callsets simply missing, bcftools' ``./.``), ``n_called`` (how
    many callsets carry the site) and ``samples`` (comma-joined sorted
    labels). Duplicate keys within one callset keep the minimum
    genotype string (deterministic; bcftools errors on those —
    normalize first for full parity).

    Plan: tagged union of the N inputs (no join tree — N-way merges
    are ONE shuffle on the site key, not N−1 full-outer joins), then a
    single groupBy with map-side partial aggs; the per-site map builds
    from a sorted struct array, so output is engine-deterministic.
    Reference capability: cohort merging its users run via `bcftools
    merge` downstream of VCF/BCF scans; the reference engine has no
    joins (py-oxbow/oxbow/_pyarrow.py:738-774)."""
    if not sets:
        raise ValueError("merge_callsets needs at least one callset")
    keys = list(key_cols)
    tagged = None
    for label, df in sets.items():
        part = df.select(
            *keys, F.lit(str(label)).alias("_lab"),
            F.col(gt_col).cast("string").alias("_gt"))
        tagged = part if tagged is None else tagged.unionByName(part)
    per = tagged.groupBy(*keys, "_lab").agg(F.min("_gt").alias("_gt"))
    merged = per.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(
                F.col("_lab").alias("label"), F.col("_gt").alias("gt")))))
        .alias("gts"),
        F.count(F.lit(1)).cast("long").alias("n_called"),
        F.array_join(F.array_sort(F.collect_list("_lab")), ",")
        .alias("samples"),
    )
    return merged
