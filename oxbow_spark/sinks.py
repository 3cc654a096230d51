"""Write path: genomic DataFrames → partitioned Parquet for cluster-scale
re-query.

The reference has no file writers (SURVEY §2.2) — its story ends at Arrow
hand-off. At 100 TB the idiomatic Spark continuation is a one-time
conversion to Parquet laid out for pruning: partition directories on
``(chrom, genomic bin)`` so a region query touches only the files whose
bin range intersects the region (Catalyst partition pruning — visible as
PartitionFilters in the scan), with min/max column statistics giving
row-group-level pruning within each file for free.

Bin width trades file count against pruning precision: 1 Mb over a human
genome gives ~3.2k partitions per sample set — comfortable for both the
driver's file index and HDFS/S3 listing. Writers repartition by the
partition columns first so each task writes one directory (no
small-files explosion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxbow_spark.coords import Region

DEFAULT_BIN = 1_000_000
BIN_COL = "gbin"


def write_partitioned(
    df: DataFrame,
    path: str,
    bin_size: int = DEFAULT_BIN,
    chrom_col: str = "chrom",
    start_col: str = "start",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Parquet partitioned by (chrom, start-bin).

    A record lands in the bin of its *start* coordinate; range reads
    therefore extend their lower bin bound by one bin so records starting
    in the previous bin but overlapping the region are still scanned
    (the residual filter drops non-overlappers) — same over-approximate
    chunk + residual re-check contract as the reference's index queries."""
    out = df.withColumn(
        BIN_COL, F.floor(F.col(start_col).cast("bigint") / F.lit(bin_size))
    )
    (
        out.repartition(F.col(chrom_col), F.col(BIN_COL))
        .write.mode(mode)
        .partitionBy(chrom_col, BIN_COL)
        .parquet(path)
    )


def read_region(
    spark: SparkSession,
    path: str,
    region: str,
    bin_size: int = DEFAULT_BIN,
    source_coords: str = "01",
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
    max_interval: int = DEFAULT_BIN,
) -> DataFrame:
    """Region query over a partitioned layout: partition pruning on
    (chrom, bin range) + residual overlap filter.

    ``max_interval`` is the longest interval length the writer may have
    stored (defaults to one bin): the lower bin bound is extended by
    ``ceil(max_interval / bin_size)`` bins so long records that *start*
    before the region still get scanned."""
    r = Region.parse(region, source_coords)
    df = spark.read.parquet(path)
    pred = F.col(chrom_col) == r.name
    back = -(-max_interval // bin_size)  # ceil
    if r.end is not None:
        pred = pred & (F.col(BIN_COL) <= F.lit((r.end - 1) // bin_size))
    pred = pred & (F.col(BIN_COL) >= F.lit(r.start // bin_size - back))
    # residual overlap re-check (0-based half-open columns)
    pred = pred & (F.col(end_col) > F.lit(r.start))
    if r.end is not None:
        pred = pred & (F.col(start_col) < F.lit(r.end))
    return df.where(pred).drop(BIN_COL)
