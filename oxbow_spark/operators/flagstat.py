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
