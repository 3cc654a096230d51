"""Materialized zoom-level ladder: write per-resolution tables, select the
best level for a requested resolution, re-bin exactly; plus streaming
dedup with duplicate-bearing input."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oxbow_spark import streaming
from oxbow_spark.operators import zoom


@pytest.fixture(scope="module")
def signal(spark, sf_dir):
    from oxbow_spark.session import read_events

    small = sf_dir.replace("sf0.01", "sf0.001")
    return (
        read_events(spark, small)
        .select(
            F.col("event_type").alias("chrom"),
            F.expr("ts div 1000000000").alias("start"),
            F.col("value"),
        )
        .cache()
    )


def test_best_zoom_level_selection():
    assert zoom.best_zoom_level([3600, 14400, 57600], 14400) == 14400
    assert zoom.best_zoom_level([3600, 14400, 57600], 20000) == 14400
    assert zoom.best_zoom_level([3600, 14400], 3599) is None
    assert zoom.best_zoom_level([], 100) is None


def test_materialize_and_read_exact_level(spark, signal, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zoom") / "ladder")
    zoom.materialize_zoom_levels(signal, path, [3600, 14400])
    assert sorted(os.listdir(path)) == ["zoom=14400", "zoom=3600"]
    got = zoom.read_zoom(spark, path, 14400, [3600, 14400])
    expect = zoom.zoom_aggregate(signal, 14400)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_read_zoom_rebins_finer_level(spark, signal, tmp_path_factory):
    """Only the fine level exists: re-binning 3600→14400 must equal the
    direct 14400 aggregation (bins nest; exact decimal sums)."""
    path = str(tmp_path_factory.mktemp("zoom2") / "ladder")
    zoom.materialize_zoom_levels(signal, path, [3600])
    got = zoom.read_zoom(spark, path, 14400, [3600])
    expect = zoom.zoom_aggregate(signal, 14400)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_read_zoom_none_when_no_level_fits(spark, signal, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zoom3") / "ladder")
    zoom.materialize_zoom_levels(signal, path, [14400])
    assert zoom.read_zoom(spark, path, 3600, [14400]) is None


def test_stream_dedup_drops_duplicate_files(spark, sf_dir, tmp_path_factory):
    """Two copies of the events file in the stream directory → every
    event arrives twice across batches; watermark-bounded dedup must
    emit each event_id once."""
    small = sf_dir.replace("sf0.01", "sf0.001")
    src = os.path.join(small, "events.parquet")
    stage = str(tmp_path_factory.mktemp("dup_stream"))
    os.symlink(src, os.path.join(stage, "a.parquet"))
    os.symlink(src, os.path.join(stage, "b.parquet"))
    from oxbow_spark.session import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1").parquet(stage))
    out = streaming.run_available_now(
        streaming.stream_dedup(stream), "t_dedup", output_mode="append"
    )
    n_distinct = spark.read.parquet(src).select("event_id").distinct().count()
    got = out.select("event_id").collect()
    assert len(got) == len({r.event_id for r in got}) == n_distinct
