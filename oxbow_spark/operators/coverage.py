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


def _depth_segments(df: DataFrame, on: str, start_col: str,
                    end_col: str) -> DataFrame:
    """Boundary-sweep core shared by the genomecov modes: ±1 events at
    interval edges → per-(key, pos) net delta (one partial-agg
    groupBy) → per-key running-sum window over DISTINCT boundaries →
    one row per elementary segment ``(on, _ss, _se, depth)``. Depth-0
    interior gaps appear as rows; the open tail past the last boundary
    does not (its depth is 0 by construction)."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    ev = df.where(e > s).select(
        F.col(on), F.explode(F.array(
            F.struct(s.alias("_p"), F.lit(1).alias("_d")),
            F.struct(e.alias("_p"), F.lit(-1).alias("_d")))).alias("_x"),
    ).select(F.col(on), F.col("_x._p").alias("_p"),
             F.col("_x._d").alias("_d"))
    net = ev.groupBy(on, "_p").agg(F.sum("_d").alias("_nd"))
    from pyspark.sql import Window
    w = Window.partitionBy(on).orderBy("_p")
    return net.select(
        F.col(on),
        F.col("_p").alias("_ss"),
        F.lead("_p").over(w).alias("_se"),
        F.sum("_nd").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("depth"),
    ).where(F.col("_se").isNotNull() & (F.col("_se") > F.col("_ss")))


def genomecov_segments(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """bedtools-genomecov ``-bga`` (bedgraph) mode: one row per
    constant-depth segment — ``(chrom, start, end, depth)``, adjacent
    segments differing in depth, depth-0 runs INCLUDED. Without
    ``sizes`` the universe is data-bounded (interior zero gaps only);
    with ``sizes`` leading/trailing zero runs and fully-uncovered
    chromosomes are emitted too, exactly like ``-bga`` with ``-g``.
    Same boundary-sweep plan as `genomecov_hist` — O(boundaries)
    shuffle, never per-position."""
    seg = _depth_segments(df, on, start_col, end_col).select(
        F.col(on), F.col("_ss").alias(start_col),
        F.col("_se").alias(end_col), F.col("depth").cast("long"))
    if sizes is None:
        return seg
    spark = df.sparkSession
    sz = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"`{on}` string, `_len` long")
    bounds = seg.groupBy(on).agg(
        F.min(start_col).alias("_lo"), F.max(end_col).alias("_hi"))
    edged = sz.join(bounds, on, "left")
    lead0 = edged.where(F.col("_lo") > 0).select(
        F.col(on), F.lit(0).cast("long").alias(start_col),
        F.col("_lo").alias(end_col), F.lit(0).cast("long").alias("depth"))
    trail0 = edged.where(
        F.col("_hi").isNotNull() & (F.col("_len") > F.col("_hi"))).select(
        F.col(on), F.col("_hi").alias(start_col),
        F.col("_len").alias(end_col), F.lit(0).cast("long").alias("depth"))
    empty0 = edged.where(F.col("_lo").isNull() & (F.col("_len") > 0)).select(
        F.col(on), F.lit(0).cast("long").alias(start_col),
        F.col("_len").alias(end_col), F.lit(0).cast("long").alias("depth"))
    return seg.unionByName(lead0).unionByName(trail0).unionByName(empty0)


def genomecov_hist(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
    include_genome: bool = True,
) -> DataFrame:
    """bedtools-genomecov (default histogram mode): per key, how many
    bases sit at each coverage depth — ``(chrom, depth, n_bases,
    chrom_len, frac)``. With ``sizes`` the depth-0 rows cover the
    uncovered remainder of each chromosome (bedtools' -g semantics,
    fully-uncovered chroms included) and a ``genome``-keyed rollup sums
    every chrom (``include_genome=False`` drops it); without ``sizes``
    only depth ≥ 1 rows appear (data-bounded universe, no 0 rows,
    no rollup). ``frac`` divides exact longs — engine-reproducible.

    Plan: a BOUNDARY SWEEP, never a per-position explode (a 3 Gbp
    genome at 30× is 10^11 position rows; its interval boundaries are
    ~2×n): ±1 events at interval start/end → per-(key, pos) net delta
    (one partial-agg groupBy) → per-key running sum window (the
    `merge_intervals` scale profile) gives each elementary segment's
    depth → (key, depth) histogram via a second partial agg. Shuffle
    volume is O(distinct boundaries), not O(genome length)."""
    seg = _depth_segments(df, on, start_col, end_col)
    hist = (seg.where(F.col("depth") > 0)
            .groupBy(on, "depth")
            .agg(F.sum(F.col("_se") - F.col("_ss")).alias("n_bases")))
    if sizes is None:
        return hist.select(F.col(on), F.col("depth").cast("long"),
                           F.col("n_bases").cast("long"))
    spark = df.sparkSession
    sz = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"`{on}` string, `_len` long")
    covered = hist.groupBy(on).agg(F.sum("n_bases").alias("_cov"))
    zero = (sz.join(covered, on, "left")
            .select(F.col(on), F.lit(0).cast("long").alias("depth"),
                    (F.col("_len") - F.coalesce("_cov", F.lit(0)))
                    .cast("long").alias("n_bases"))
            .where(F.col("n_bases") > 0))
    per = (hist.select(F.col(on), F.col("depth").cast("long"),
                       F.col("n_bases").cast("long"))
           .unionByName(zero)
           .join(F.broadcast(sz), on)
           .select(F.col(on), "depth", "n_bases",
                   F.col("_len").alias("chrom_len"),
                   (F.col("n_bases").cast("double")
                    / F.col("_len").cast("double")).alias("frac")))
    if not include_genome:
        return per
    glen = sum(int(v) for v in sizes.values())
    gen = (per.groupBy("depth")
           .agg(F.sum("n_bases").cast("long").alias("n_bases"))
           .select(F.lit("genome").alias(on), "depth", "n_bases",
                   F.lit(glen).cast("long").alias("chrom_len"),
                   (F.col("n_bases").cast("double")
                    / F.lit(float(glen))).alias("frac")))
    return per.unionByName(gen)
