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
                    end_col: str,
                    split_bp: int | None = None) -> DataFrame:
    """Boundary-sweep core shared by the genomecov modes: ±1 events at
    interval edges → per-(key, pos) net delta (one partial-agg
    groupBy) → per-key running-sum window over DISTINCT boundaries →
    one row per MAXIMAL constant-depth segment ``(on, _ss, _se,
    depth)``. Net-zero boundaries (bookended intervals) are dropped
    before the window — they cannot change the running sum, so the
    output is maximal runs, exactly bedtools' transition points.
    Depth-0 interior gaps appear as rows; the open tail past the last
    boundary does not (its depth is 0 by construction).

    ``split_bp`` (the 100× scale path — `merge_intervals`' chunked
    discipline applied to the sweep): boundaries hash into
    ``floor(pos / split_bp)`` chunks, the running-sum window keys on
    (key, chunk) so no task holds more than one chunk's boundaries,
    and a TINY per-chunk summary frame (one row per non-empty chunk:
    its net-delta total and first boundary) supplies each chunk's
    cumulative depth offset — via a per-key window over
    O(contig/split_bp) rows — plus the next chunk's first boundary to
    close each chunk's last segment. One co-partitioned (key, chunk)
    join stitches them; the result is bit-identical to the plain path
    (property-tested in tests/test_coverage.py)."""
    from pyspark.sql import Window

    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    ev = df.where(e > s).select(
        F.col(on), F.explode(F.array(
            F.struct(s.alias("_p"), F.lit(1).alias("_d")),
            F.struct(e.alias("_p"), F.lit(-1).alias("_d")))).alias("_x"),
    ).select(F.col(on), F.col("_x._p").alias("_p"),
             F.col("_x._d").alias("_d"))
    net = (ev.groupBy(on, "_p").agg(F.sum("_d").alias("_nd"))
           .where(F.col("_nd") != 0))
    if split_bp is None:
        w = Window.partitionBy(on).orderBy("_p")
        return net.select(
            F.col(on),
            F.col("_p").alias("_ss"),
            F.lead("_p").over(w).alias("_se"),
            F.sum("_nd").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
            .alias("depth"),
        ).where(F.col("_se").isNotNull() & (F.col("_se") > F.col("_ss")))

    bp = int(split_bp)
    if bp <= 0:
        raise ValueError("split_bp must be positive")
    chunked = net.withColumn("_k", F.floor(F.col("_p") / bp))
    wk = Window.partitionBy(on, "_k").orderBy("_p")
    per = chunked.select(
        F.col(on), "_k", "_p",
        F.lead("_p").over(wk).alias("_np"),
        F.sum("_nd").over(
            wk.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_cum"),
    )
    summ = chunked.groupBy(on, "_k").agg(
        F.sum("_nd").alias("_tot"), F.min("_p").alias("_first"))
    ws = Window.partitionBy(on).orderBy("_k")
    offs = summ.select(
        F.col(on), "_k",
        F.coalesce(
            F.sum("_tot").over(ws.rowsBetween(Window.unboundedPreceding,
                                              -1)),
            F.lit(0)).alias("_off"),
        F.lead("_first").over(ws).alias("_nf"),
    )
    return (
        per.join(offs, [on, "_k"])
        .select(
            F.col(on),
            F.col("_p").alias("_ss"),
            F.coalesce("_np", "_nf").alias("_se"),
            (F.col("_cum") + F.col("_off")).alias("depth"),
        )
        .where(F.col("_se").isNotNull() & (F.col("_se") > F.col("_ss")))
    )


def genomecov_segments(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
    split_bp: int | None = None,
) -> DataFrame:
    """bedtools-genomecov ``-bga`` (bedgraph) mode: one row per MAXIMAL
    constant-depth segment — ``(chrom, start, end, depth)``, adjacent
    segments always differing in depth (net-zero bookend boundaries
    are dropped pre-window), depth-0 runs INCLUDED. Without ``sizes``
    the universe is data-bounded (interior zero gaps only); with
    ``sizes`` leading/trailing zero runs and fully-uncovered
    chromosomes are emitted too, exactly like ``-bga`` with ``-g``.
    Same boundary-sweep plan as `genomecov_hist` — O(boundaries)
    shuffle, never per-position; ``split_bp`` enables the chunked
    (key, chunk) window for single-contig skew (see
    `_depth_segments`)."""
    seg = _depth_segments(df, on, start_col, end_col, split_bp).select(
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
    split_bp: int | None = None,
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
    volume is O(distinct boundaries), not O(genome length).
    ``split_bp`` chunks the running-sum window on (key, chunk) for
    single-contig skew (see `_depth_segments`)."""
    seg = _depth_segments(df, on, start_col, end_col, split_bp)
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
