"""Interval-overlap join as a binned equi-join.

The reference defers joins to downstream engines
(`py-oxbow/oxbow/_pyarrow.py:738-774` raises NotImplementedError), but the
interval-overlap join is the motivating genomic use case
(`docs/user-guide/coordinate-systems.md:24`). A naive range join
``a.chrom = b.chrom AND a.start < b.end AND b.start < a.end`` forces
Spark into BroadcastNestedLoopJoin — O(n*m) per chrom, dead at scale.

Scale-first strategy (the standard genomics/OLAP binning trick):

1. pick a bin width ``B``;
2. explode each interval into the bins it spans
   (``sequence(floor(start/B), floor((end-1)/B))``) — cheap, JVM-side;
3. shuffle-equi-join on ``(chrom, bin)`` — hash join, partition-parallel;
4. residual overlap predicate re-check (mirrors the reference's
   index-chunk residual re-check, `batch_iterator/query.rs:142-159`);
5. emit each pair exactly once WITHOUT a distinct-shuffle: keep only the
   match found in the bin containing ``max(a.start, b.start)``.

Cost: shuffle volume = rows x avg_bins_per_interval; pick B close to the
median interval length. Skewed chroms are handled by AQE skew-join.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _explode_bins(df: DataFrame, start: str, end: str, bin_size: int, side: str) -> DataFrame:
    b = F.lit(bin_size)
    return df.withColumn(
        f"_{side}_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("bigint") / b),
                F.floor((F.col(end).cast("bigint") - 1) / b),
            )
        ),
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_size: int,
    on: str | list[str] = "chrom",
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    how: str = "inner",
    min_overlap_frac: float | None = None,
) -> DataFrame:
    """Join rows whose half-open intervals overlap, per partition key(s).

    Overlap predicate: ``l.start < r.end AND r.start < l.end`` (0-based
    half-open; normalize 1-based inputs with oxbow_spark.coords first).
    ``min_overlap_frac`` adds the bedtools ``-f`` requirement: the
    clipped overlap must cover at least that fraction of the LEFT
    interval's length (still a pure join predicate — no extra pass).
    Column name collisions between left and right must be resolved by the
    caller (alias/prefix) except the ``on`` keys, which are coalesced.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # explicit aliases: both sides often derive from the same source
    # DataFrame, and unaliased self-join refs resolve ambiguously
    l = _explode_bins(left, left_start, left_end, bin_size, "l").alias("__l")
    r = _explode_bins(right, right_start, right_end, bin_size, "r").alias("__r")
    lc = lambda c: F.col(f"__l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__r.{c}")  # noqa: E731
    cond = [lc(k) == rc(k) for k in keys]
    cond.append(lc("_l_bin") == rc("_r_bin"))
    ls, le = lc(left_start).cast("bigint"), lc(left_end).cast("bigint")
    rs, re_ = rc(right_start).cast("bigint"), rc(right_end).cast("bigint")
    cond.append((ls < re_) & (rs < le))
    if min_overlap_frac is not None:
        ov = F.least(le, re_) - F.greatest(ls, rs)
        cond.append(
            ov.cast("double")
            >= F.lit(float(min_overlap_frac)) * (le - ls).cast("double"))
    # dedup-without-shuffle: emit the pair only from the bin that contains
    # the larger of the two starts (that bin always exists and is unique).
    cond.append(lc("_l_bin") == F.floor(F.greatest(ls, rs) / F.lit(bin_size)))
    joined = l.join(r, functools.reduce(lambda a, b: a & b, cond), how)
    out = [lc(c) for c in left.columns] + [
        rc(c) for c in right.columns if c not in keys
    ]
    return joined.select(*out)
