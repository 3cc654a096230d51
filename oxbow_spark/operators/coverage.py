"""Binned coverage / read-depth profiles over interval frames.

The mosdepth/samtools-bedcov operation the reference's users run
downstream of its scans (oxbow delegates all post-scan analytics to
Polars/DuckDB — e.g. the README's "summary statistics" workflows): given
intervals (chrom, start, end), produce per-bin depth — how many
intervals overlap each fixed-size bin and how many clipped base-pairs
they contribute.

100 TB plan shape: each interval explodes into only the bins it touches
(`F.sequence` — narrow, fan-out bounded by interval_length/bin_size),
then ONE (chrom, bin) hash aggregation with map-side partials. This is
the `operators/zoom.py` discipline applied to intervals instead of
points; no window, no sort, no join. Genome-scale skew (a hot contig)
lands on the (chrom, bin) composite key, which already spreads it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def depth_profile(
    df: DataFrame, bin_size: int, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
) -> DataFrame:
    """(chrom, bin, bin_start, n_reads, covered_bp, mean_depth): per-bin
    interval depth. Intervals are half-open [start, end); ``n_reads``
    counts intervals overlapping the bin, ``covered_bp`` sums their
    per-bin clipped lengths, ``mean_depth`` = covered_bp / bin_size.
    Empty bins inside gaps are absent (sparse output — callers needing
    dense tracks join against a bin spine)."""
    s, e = F.col(start_col), F.col(end_col)
    first = F.floor(s / bin_size).cast("long")
    last = F.floor((e - 1) / bin_size).cast("long")
    binned = df.where(e > s).select(
        F.col(on),
        s.alias("_s"),
        e.alias("_e"),
        F.explode(F.sequence(first, last)).alias("bin"),
    )
    bs = F.col("bin") * bin_size
    clipped = (
        F.least(F.col("_e"), bs + bin_size) - F.greatest(F.col("_s"), bs)
    ).cast("long")
    return (
        binned.select(F.col(on), "bin", clipped.alias("_c"))
        .groupBy(on, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_reads"),
            F.sum("_c").alias("covered_bp"),
        )
        .withColumn("bin_start", (F.col("bin") * bin_size).cast("long"))
        .withColumn(
            "mean_depth", F.col("covered_bp") / F.lit(float(bin_size))
        )
    )
