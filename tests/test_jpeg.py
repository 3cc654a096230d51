"""Baseline JPEG decoder: round-trips against the independent test
encoder (FDCT + canonical Huffman writer in `tests/jpeg_synth.py`),
sampling/restart variants, honest gates, and the Spark real-decode
path returning true JPEG pixel means."""

from __future__ import annotations

import numpy as np
import pytest

from oxbow_spark.operators import multimodal
from oxbow_spark.operators.jpeg import decode_jpeg, jpeg_pixel_stats
from tests.jpeg_synth import encode_jpeg


def test_solid_gray_exact():
    px = np.full((16, 16), 200, np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == (16, 16)
    assert np.array_equal(got, px)  # flat quant, DC-only: bit-exact


def test_random_gray_within_quant_error():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (24, 17), np.uint8)  # non-multiple-of-8 dims
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_color_444_within_ycbcr_error():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (19, 21, 3), np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(float) - px.astype(float)).max() <= 4


@pytest.mark.parametrize("sampling", [
    [(2, 2), (1, 1), (1, 1)],  # 4:2:0
    [(2, 1), (1, 1), (1, 1)],  # 4:2:2
])
def test_chroma_subsampling(sampling):
    yy, xx = np.mgrid[0:32, 0:40]
    px = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                   ((yy + xx) * 2) % 256], -1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px, sampling=sampling))
    assert got.shape == px.shape
    # smooth gradients survive chroma subsampling closely
    assert np.abs(got.astype(float) - px.astype(float)).mean() < 2.0


def test_restart_markers_and_quant():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 64), np.uint8)
    got = decode_jpeg(encode_jpeg(px, restart_interval=2))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2
    # coarser quant still lands near the true mean
    got8 = decode_jpeg(encode_jpeg(px, quant=8))
    assert abs(float(got8.mean()) - float(px.mean())) < 2.0


def test_pixel_stats():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (12, 30, 3), np.uint8)
    w, h, c, mean = jpeg_pixel_stats(encode_jpeg(px))
    assert (w, h, c) == (30, 12, 3)
    assert abs(mean - float(px.mean()) / 255.0) < 0.005


def test_honest_gates():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    px = np.full((8, 8), 90, np.uint8)
    blob = bytearray(encode_jpeg(px))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC3  # masquerade as lossless sequential
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    # a baseline full-band scan inside a claimed-progressive frame is
    # rejected, not silently misdecoded
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(blob))


def test_real_jpeg_px_mean_through_spark(spark):
    """decode_image_stub(real=True) must return the true pixel mean for
    baseline JPEGs via the full entropy decode — not null."""
    rng = np.random.default_rng(5)
    rows, truth = [], {}
    for i in range(3):
        px = rng.integers(0, 256, (16 + 8 * i, 24, 3), np.uint8)
        truth[i] = (24, 16 + 8 * i, 3, float(px.mean()) / 255.0)
        rows.append((i, bytearray(encode_jpeg(px))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.decode_image_stub(df, real=True).collect()}
    for i, (w, h, c, m) in truth.items():
        r = got[i]
        assert (r.width, r.height, r.channels) == (w, h, c)
        assert r.px_mean is not None and abs(r.px_mean - m) < 0.005


# ------------------------------------------------------------ progressive

from tests.jpeg_synth import encode_jpeg_progressive  # noqa: E402


def test_progressive_solid_exact():
    px = np.full((16, 16), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(px)), px)


def test_progressive_gray_random():
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (24, 17), np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_progressive_color_444():
    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, (40, 56, 3), np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(px))
    assert np.abs(got.astype(float) - px.astype(float)).max() <= 4


def test_progressive_420():
    yy, xx = np.mgrid[0:32, 0:40]
    px = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                   ((yy + xx) * 2) % 256], -1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg_progressive(
        px, sampling=[(2, 2), (1, 1), (1, 1)]))
    assert np.abs(got.astype(float) - px.astype(float)).mean() < 2.0


def test_progressive_sparse_eob_runs():
    """Mostly-flat image → long cross-block EOB runs in every AC scan,
    plus refinement corrections on the few energetic blocks."""
    px = np.full((48, 48), 128, np.uint8)
    px[5, 7] = 255
    px[30, 40] = 0
    got = decode_jpeg(encode_jpeg_progressive(px))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1


def test_progressive_matches_baseline_decode():
    """Progressive and baseline encodings of the same image decode to
    (near-)identical pixels through the one decoder."""
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (21, 33), np.uint8)
    a = decode_jpeg(encode_jpeg(px))
    b = decode_jpeg(encode_jpeg_progressive(px))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_progressive_real_path_through_spark(spark):
    rng = np.random.default_rng(24)
    px = rng.integers(0, 256, (16, 24, 3), np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(encode_jpeg_progressive(px)))],
        "doc_id long, payload binary")
    r = multimodal.decode_image_stub(df, real=True).collect()[0]
    assert (r.width, r.height, r.channels) == (24, 16, 3)
    assert r.px_mean is not None
    assert abs(r.px_mean - float(px.mean()) / 255.0) < 0.01


def test_multi_scan_sequential_baseline_gated():
    """A sequential-baseline SOS that does not cover every frame
    component (legal multi-scan file) must raise, not misdecode as an
    interleaved scan."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (8, 8, 3), np.uint8)
    blob = bytearray(encode_jpeg(px))
    sos = blob.find(b"\xff\xda")
    assert blob[sos + 4] == 3  # interleaved 3-component scan header
    blob[sos + 2:sos + 4] = (8).to_bytes(2, "big")  # len: 2+1+2*1+3
    blob[sos + 4] = 1  # ns=1 → scan covers only component 1
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(bytes(blob))
