"""Register all genomic DataSources on a SparkSession."""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    from oxbow_spark.sources.bam import BamDataSource
    from oxbow_spark.sources.bbi import BigBedDataSource, BigWigDataSource
    from oxbow_spark.sources.bcf import BcfDataSource
    from oxbow_spark.sources.cram import CramDataSource
    from oxbow_spark.sources.bed import BedDataSource
    from oxbow_spark.sources.gxf import GffDataSource, GtfDataSource
    from oxbow_spark.sources.sam import SamDataSource
    from oxbow_spark.sources.sequence import FastaDataSource, FastqDataSource
    from oxbow_spark.sources.vcf import VcfDataSource

    for src in (
        BedDataSource, GtfDataSource, GffDataSource,
        SamDataSource, VcfDataSource, FastaDataSource, FastqDataSource,
        BamDataSource, BcfDataSource, CramDataSource,
        BigWigDataSource, BigBedDataSource,
    ):
        spark.dataSource.register(src)
