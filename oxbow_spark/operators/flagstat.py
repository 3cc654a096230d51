"""samtools-flagstat twin: one-pass alignment summary statistics.

The single most-run alignment QC command; the reference scans the flags
column (`oxbow/src/alignment/model/field.rs` Flags) and leaves counting
to downstream engines. Here it is ONE conditional aggregation over the
scan — every counter is a `sum(when(...))` on the same pass, so the
plan is scan → partial agg → single-row final agg (map-side combined,
no shuffle of record data at any scale).

Counter semantics follow `samtools flagstat` (htslib docs, public):
primary = not secondary and not supplementary; mapped = not unmapped;
"mapped %" is over the matching total; properly-paired / singleton /
mate-mapped counters apply to primary paired reads only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxbow_spark.functions.genomics import flag_is


def flagstat(df: DataFrame, flag_col: str = "flag",
             mapq_col: str | None = None) -> DataFrame:
    """Single-row DataFrame of samtools-flagstat counters.

    ``mapq_col`` (if given) adds `primary_mapped_mapq_ge30`. Columns are
    long counts; rate columns are doubles in [0, 1] (samtools prints
    them as percentages)."""
    f = F.col(flag_col)

    def is_(name):
        return flag_is(f, name)

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    primary = ~is_("secondary") & ~is_("supplementary")
    mapped = ~is_("unmapped")
    paired = is_("paired")
    aggs = [
        cnt(F.lit(True), "total"),
        cnt(primary, "primary"),
        cnt(is_("secondary"), "secondary"),
        cnt(is_("supplementary"), "supplementary"),
        cnt(is_("duplicate"), "duplicates"),
        cnt(primary & is_("duplicate"), "primary_duplicates"),
        cnt(mapped, "mapped"),
        cnt(primary & mapped, "primary_mapped"),
        cnt(is_("qc_fail"), "qc_fail"),
        cnt(primary & paired, "paired_reads"),
        cnt(primary & paired & is_("read1"), "read1"),
        cnt(primary & paired & is_("read2"), "read2"),
        cnt(primary & paired & is_("proper_pair") & mapped,
            "properly_paired"),
        cnt(primary & paired & mapped & ~is_("mate_unmapped"),
            "with_mate_mapped"),
        cnt(primary & paired & mapped & is_("mate_unmapped"), "singletons"),
    ]
    if mapq_col is not None:
        aggs.append(cnt(primary & mapped & (F.col(mapq_col) >= 30),
                        "primary_mapped_mapq_ge30"))
    out = df.agg(*aggs)
    return out.withColumns({
        "mapped_rate": F.col("mapped") / F.greatest(F.col("total"), F.lit(1)),
        "primary_mapped_rate":
            F.col("primary_mapped") / F.greatest(F.col("primary"), F.lit(1)),
        "properly_paired_rate":
            F.col("properly_paired")
            / F.greatest(F.col("paired_reads"), F.lit(1)),
    })


def template_stats(df: DataFrame, flag_col: str = "flag",
                   tlen_col: str = "tlen",
                   max_insert: int = 10000) -> DataFrame:
    """Insert-size summary for properly-paired primary reads (the
    `samtools stats` IS section): one conditional-aggregation pass over
    |tlen| of the leftmost mate (tlen > 0 — counts each template once),
    clipped to ``max_insert`` to keep chimeras out of the moments.
    Returns a single row: n_templates, mean/stddev/min/max insert."""
    f = F.col(flag_col)
    t = F.col(tlen_col).cast("long")
    proper = flag_is(f, "paired") & flag_is(f, "proper_pair") \
        & ~flag_is(f, "unmapped") & ~flag_is(f, "secondary") \
        & ~flag_is(f, "supplementary") & (t > 0) & (t <= max_insert)
    v = F.when(proper, t)
    return df.agg(
        F.count(v).alias("n_templates"),
        F.avg(v).alias("mean_insert"),
        F.stddev_samp(v).alias("sd_insert"),
        F.min(v).alias("min_insert"),
        F.max(v).alias("max_insert"),
    )


def sn_stats(df: DataFrame, flag_col: str = "flag", seq_col: str = "seq",
             qual_col: str = "qual", cigar_col: str = "cigar",
             nm_col: str = "nm", mapq_col: str = "mapq",
             tlen_col: str = "tlen", max_insert: int = 10000) -> DataFrame:
    """`samtools stats` SN-section panel (the second most-run triage
    tool after flagstat/idxstats) as ONE conditional aggregation:

    - raw_total_sequences / reads_mapped / reads_mq0 — samtools' "raw"
      universe excludes secondary+supplementary records;
    - total_length / average_length / maximum_length — over raw reads;
    - bases_mapped — read-length sum of mapped raw reads;
    - bases_mapped_cigar — the "more accurate" variant: per-read sum of
      M/I/=/X CIGAR op lengths (regexp-extracted JVM-side, no UDF);
    - mismatches / error_rate — NM-tag sum ÷ bases_mapped_cigar;
    - average_quality — per-BASE mean of phred(+33) quality chars over
      raw reads (char array staged per row, summed in the same agg);
    - insert_size_average / insert_size_sd — leftmost proper-pair
      templates (tlen in (0, max_insert]), moments kept as EXACT long
      sums (t, t², n) with the double math applied once at the end in
      a fixed operation order — correctly-rounded IEEE ops on exact
      integers, so any engine reproduces the value bit-identically
      (unlike streaming stddev aggregates, which differ by ~1 ulp
      between engines).

    Plan: one staging Project (lengths, per-row quality sum, per-row
    cigar sum — each a bounded array expression over the row's own
    data) → map-side partial agg → single-row final agg. No shuffle of
    record data; scan-speed at any scale."""
    f = F.col("_flag")

    def is_(name):
        return flag_is(f, name)

    staged = df.select(
        F.col(flag_col).alias("_flag"),
        F.length(F.col(seq_col)).cast("long").alias("_len"),
        F.aggregate(
            F.filter(F.split(F.col(qual_col), ""),
                     lambda x: x != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (F.ascii(x) - 33).cast("long"),
        ).alias("_qsum"),
        F.aggregate(
            F.regexp_extract_all(F.col(cigar_col),
                                 F.lit(r"(\d+)[MI=X]"), F.lit(1)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ).alias("_cig"),
        F.col(nm_col).cast("long").alias("_nm"),
        F.col(mapq_col).cast("long").alias("_mapq"),
        F.col(tlen_col).cast("long").alias("_tlen"),
    )
    raw = ~is_("secondary") & ~is_("supplementary")
    mapped = raw & ~is_("unmapped")
    t = F.col("_tlen")
    tpl = is_("paired") & is_("proper_pair") & ~is_("unmapped") \
        & raw & (t > 0) & (t <= max_insert)

    def csum(cond, col, name):
        return F.sum(F.when(cond, col)).cast("long").alias(name)

    agg = staged.agg(
        F.sum(raw.cast("long")).cast("long").alias("raw_total_sequences"),
        F.sum(mapped.cast("long")).cast("long").alias("reads_mapped"),
        F.sum((mapped & (F.col("_mapq") == 0)).cast("long")).cast("long")
        .alias("reads_mq0"),
        csum(raw, F.col("_len"), "total_length"),
        F.max(F.when(raw, F.col("_len"))).cast("long")
        .alias("maximum_length"),
        csum(mapped, F.col("_len"), "bases_mapped"),
        csum(mapped, F.col("_cig"), "bases_mapped_cigar"),
        csum(mapped, F.col("_nm"), "mismatches"),
        csum(raw, F.col("_qsum"), "_q"),
        F.count(F.when(tpl, t)).cast("long").alias("_tn"),
        csum(tpl, t, "_t1"),
        csum(tpl, t * t, "_t2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n, s1, s2 = d("_tn"), d("_t1"), d("_t2")
    return agg.select(
        "raw_total_sequences", "reads_mapped", "reads_mq0",
        "total_length",
        F.when(F.col("raw_total_sequences") > 0,
               d("total_length") / d("raw_total_sequences"))
        .alias("average_length"),
        "maximum_length", "bases_mapped", "bases_mapped_cigar",
        "mismatches",
        F.when(F.col("bases_mapped_cigar") > 0,
               d("mismatches") / d("bases_mapped_cigar"))
        .alias("error_rate"),
        F.when(F.col("total_length") > 0, d("_q") / d("total_length"))
        .alias("average_quality"),
        F.when(F.col("_tn") > 0, s1 / n).alias("insert_size_average"),
        F.when(F.col("_tn") > 1,
               F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0))))
        .alias("insert_size_sd"),
    )
