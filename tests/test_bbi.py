"""BigWig/BigBed (BBI) source tests + zoom_aggregate parity with the
reference's precomputed zoom levels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

FIX = "/root/reference/fixtures"
BW = f"{FIX}/sample.bw"
BB = f"{FIX}/sample.bb"


@pytest.fixture(scope="session")
def gspark(spark):
    from oxbow_spark.sources import register_all

    register_all(spark)
    return spark


def test_bigwig_scan(gspark):
    df = gspark.read.format("bigwig").load(BW)
    rows = df.collect()
    assert len(rows) == 100
    assert rows[0].chrom == "chr21" and rows[0].start == 9486505
    assert rows[0].end == 9486520 and rows[0].value == 40.0
    assert df.schema["value"].dataType.typeName() == "float"


def test_bigwig_region(gspark):
    reg = (
        gspark.read.format("bigwig")
        .option("regions", "chr21:[9486505,9486520)").load(BW)
    )
    assert reg.count() == 1
    empty = (
        gspark.read.format("bigwig").option("regions", "chr1:[0,1000)").load(BW)
    )
    assert empty.count() == 0


def test_bigwig_coords(gspark):
    a = gspark.read.format("bigwig").load(BW).first()
    b = gspark.read.format("bigwig").option("coords", "11").load(BW).first()
    assert b.start == a.start + 1 and b.end == a.end


def test_bigbed_scan(gspark):
    df = gspark.read.format("bigbed").load(BB)
    rows = df.collect()
    assert len(rows) == 100
    assert rows[0].chrom == "chr21" and rows[0].start == 14797911


def test_zoom_scan(gspark):
    z = gspark.read.format("bigwig").option("zoom", "0").load(BW)
    rows = z.collect()
    assert rows and rows[0].bases_covered == 25
    assert rows[0].min == 20.0 and rows[0].max == 40.0 and rows[0].sum == 900.0
    with pytest.raises(Exception, match="zoom level"):
        gspark.read.format("bigwig").option("zoom", "9").load(BW).collect()


def test_metadata(gspark):
    from oxbow_spark.sources.bbi import BigWigDataSource

    src = BigWigDataSource({"path": BW})
    assert src.chrom_sizes() == {"chr21": 48129895}
    assert src.zoom_levels() == [2621440, 10485760, 41943040]


def test_zoom_aggregate_parity(gspark):
    """Our zoom_aggregate operator over base signal must agree with the
    reference's precomputed zoom table on bin-independent totals
    (BBI zoom bins anchor at the first data position, not the grid, so
    per-bin rows aren't directly comparable)."""
    from oxbow_spark.operators.zoom import zoom_aggregate

    base = gspark.read.format("bigwig").load(BW)
    ours = zoom_aggregate(base, resolution=2621440, end_col="end")
    o = ours.agg(
        F.sum("bases_covered").alias("bases"),
        F.min("min").alias("mn"), F.max("max").alias("mx"),
        F.sum("sum").alias("s"), F.sum("sum_squares").alias("ss"),
    ).first()
    z = gspark.read.format("bigwig").option("zoom", "0").load(BW)
    t = z.agg(
        F.sum("bases_covered").alias("bases"),
        F.min("min").alias("mn"), F.max("max").alias("mx"),
        F.sum("sum").alias("s"), F.sum("sum_squares").alias("ss"),
    ).first()
    assert o.bases == t.bases
    assert o.mn == t.mn and o.mx == t.mx
    assert abs(o.s - t.s) < 1e-3 and abs(o.ss - t.ss) < 1e-1
