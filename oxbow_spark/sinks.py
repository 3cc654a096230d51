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


def sort_write_alignments(
    df: DataFrame,
    path: str,
    header: str,
    fmt: str = "bam",
    index: str | None = "bai",
    partitions: int | None = None,
    single_file: str | None = None,
    rname_col: str = "rname",
    pos_col: str = "pos",
    **write_options,
) -> str:
    """``samtools sort`` (+ ``index`` + ``cat``) at cluster scale:
    coordinate-sort an alignment frame and deliver either a directory
    of globally-ordered indexed parts or — ``single_file=`` — ONE
    spec-conformant sorted, indexed file.

    Plan: (1) rname → tid from the header's @SQ order (a broadcast
    literal map; ``*``/unknown contigs and null positions sort LAST —
    samtools' unmapped-at-end rule); (2) ``repartitionByRange`` on
    (tid, pos) — Spark SAMPLES the key distribution, so partitions
    stay balanced even when one contig holds most reads (the classic
    sort-skew case); (3) ``sortWithinPartitions`` — no global
    single-node sort ever materializes; (4) every task writes one
    self-contained part named ``part-<partitionId>-…`` with its
    index built inline, so the sorted directory is range-queryable
    as-is; (5) ``single_file`` splices the ordered parts with the
    ``cat_*`` family — O(bytes) raw block copy + arithmetic index
    merge, the samtools-cat contract, producing a coordinate-sorted
    whole with a merged sidecar. Cost: ONE range shuffle of the
    records; everything else is per-task streaming.

    Returns the part directory (or ``single_file`` when given)."""
    from oxbow_spark.models.sam_header import SamHeader
    from oxbow_spark.sources.align_write import committed_parts

    if fmt not in ("bam", "sam", "cram"):
        raise ValueError(f"sort_write_alignments: unsupported fmt {fmt!r}")
    names = SamHeader.parse(header.splitlines()).chrom_names
    if not names:
        raise ValueError("header has no @SQ lines to order contigs by")
    out = _range_sort_by_contig(df, names, rname_col, pos_col, partitions)
    w = out.write.format(fmt).option("header", header).mode("overwrite")
    if index:
        w = w.option("index", index)
    for k, v in write_options.items():
        w = w.option(k, v)
    w.save(path)
    if single_file is None:
        return path
    # exactly the parts the writer COMMITTED, in numeric partition
    # order — never a lexicographic glob (orphan attempts, >99999
    # partitions; see align_write._reconcile_parts)
    suffix = {"bam": ".bam", "sam": ".sam", "cram": ".cram"}[fmt]
    parts = committed_parts(path, suffix)
    if fmt == "bam":
        from oxbow_spark.sources.cat import cat_bam
        cat_bam(parts, single_file, index=index)
    elif fmt == "cram":
        from oxbow_spark.sources.cat import cat_cram
        cat_cram(parts, single_file, index=index)
    else:  # sam: plain text splice, headers dropped after part 0
        with open(single_file, "w", encoding="ascii") as f:
            for pi, p in enumerate(parts):
                with open(p, "r", encoding="ascii") as g:
                    for line in g:
                        if line.startswith("@") and pi > 0:
                            continue
                        f.write(line)
    return single_file


def _range_sort_by_contig(df: DataFrame, names: list[str],
                          key_col: str, pos_col: str,
                          partitions: int | None) -> DataFrame:
    """Shared sort core: key → ordinal from the header's contig order
    (broadcast literal map; unknown keys and null positions LAST),
    ONE sampled range shuffle, per-partition sort, helper cols dropped."""
    mapping = []
    for i, n in enumerate(names):
        mapping += [F.lit(n), F.lit(i)]
    tid = F.coalesce(
        F.element_at(F.create_map(*mapping), F.col(key_col)),
        F.lit(len(names)))
    spos = F.coalesce(F.col(pos_col).cast("long"), F.lit(1 << 62))
    staged = df.withColumn("_tid", tid).withColumn("_spos", spos)
    rp = (staged.repartitionByRange(partitions, "_tid", "_spos")
          if partitions else staged.repartitionByRange("_tid", "_spos"))
    return rp.sortWithinPartitions("_tid", "_spos").drop("_tid", "_spos")


def sort_write_variants(
    df: DataFrame,
    path: str,
    header: str,
    fmt: str = "vcf",
    index: str | None = "tbi",
    partitions: int | None = None,
    single_file: str | None = None,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    **write_options,
) -> str:
    """``bcftools sort`` (+ index + concat) at cluster scale — the
    variant twin of `sort_write_alignments`: contig order comes from
    the header's ``##contig=<ID=…>`` lines, the sort is ONE sampled
    range shuffle + per-task writes of self-contained indexed parts
    (VCF parts are BGZF so their `.tbi`/`.csi` sidecars work
    standalone), and ``single_file`` splices parts by raw BGZF block
    copy with an arithmetic sidecar merge (`cat_bgzf_text` /
    `cat_bcf`). Returns the part directory or ``single_file``."""
    import re as _re

    from oxbow_spark.sources.align_write import committed_parts

    if fmt not in ("vcf", "bcf"):
        raise ValueError(f"sort_write_variants: unsupported fmt {fmt!r}")
    names = _re.findall(r"##contig=<ID=([^,>]+)", header)
    if not names:
        raise ValueError("header has no ##contig lines to order by")
    out = _range_sort_by_contig(df, names, chrom_col, pos_col, partitions)
    w = out.write.format(fmt).option("header", header).mode("overwrite")
    if fmt == "vcf":
        w = w.option("compression", "bgzf")
    if index:
        w = w.option("index", index)
    for k, v in write_options.items():
        w = w.option(k, v)
    w.save(path)
    if single_file is None:
        return path
    if fmt == "bcf":
        from oxbow_spark.sources.cat import cat_bcf
        cat_bcf(committed_parts(path, ".bcf"), single_file, index=index)
    else:
        from oxbow_spark.sources.cat import cat_bgzf_text
        cat_bgzf_text(committed_parts(path, ".vcf.gz"), single_file,
                      index=index)
    return single_file
