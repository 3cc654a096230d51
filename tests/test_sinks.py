"""Partitioned write path: (chrom, bin) Parquet layout, partition-pruned
region read-back, long-interval safety margin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oxbow_spark import sinks


@pytest.fixture(scope="module")
def intervals(spark):
    # synthetic intervals over two chroms, 0-based half-open
    rows = []
    for i in range(2000):
        chrom = "chr1" if i % 3 else "chr2"
        start = (i * 7919) % 5_000_000
        rows.append((i, chrom, start, start + 100 + (i % 400)))
    return spark.createDataFrame(rows, ["id", "chrom", "start", "end"])


def test_write_read_region_roundtrip(spark, intervals, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gparq") / "tbl")
    sinks.write_partitioned(intervals, path, bin_size=1_000_000)
    # layout: chrom=<c>/gbin=<b> directories
    top = sorted(d for d in os.listdir(path) if d.startswith("chrom="))
    assert top == ["chrom=chr1", "chrom=chr2"]
    assert any(d.startswith("gbin=") for d in os.listdir(os.path.join(path, top[0])))

    region = "chr1:[1000000,2000000)"
    got = sinks.read_region(spark, path, region, bin_size=1_000_000, max_interval=500)
    expect = intervals.where(
        (F.col("chrom") == "chr1") & (F.col("start") < 2_000_000)
        & (F.col("end") > 1_000_000)
    )
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in expect.collect())


def test_read_region_prunes_partitions(spark, intervals, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gparq2") / "tbl")
    sinks.write_partitioned(intervals, path, bin_size=1_000_000)
    df = sinks.read_region(spark, path, "chr2:[0,1000000)", max_interval=500)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst partition pruning must reach the scan
    assert "PartitionFilters" in plan
    assert all(r.chrom == "chr2" for r in df.collect())


def test_boundary_straddling_interval_found(spark, tmp_path_factory):
    # record starts in bin 0 but overlaps a region entirely inside bin 1
    df = spark.createDataFrame(
        [(1, "chr1", 999_950, 1_000_100), (2, "chr1", 500, 600)],
        ["id", "chrom", "start", "end"],
    )
    path = str(tmp_path_factory.mktemp("gparq3") / "tbl")
    sinks.write_partitioned(df, path, bin_size=1_000_000)
    got = sinks.read_region(
        spark, path, "chr1:[1000000,1000050)", max_interval=1000
    )
    assert [r.id for r in got.collect()] == [1]
