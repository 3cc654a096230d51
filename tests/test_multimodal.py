"""Multimodal plumbing: payload synthesis, sniffing, decode stub batch
shape, frame expansion, embedding featurizer determinism."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators import multimodal


@pytest.fixture(scope="module")
def payload_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.attach_fake_payload(docs.limit(40)).cache()


def test_payload_header_cycles(payload_df):
    rows = payload_df.collect()
    assert rows
    for r in rows:
        b = bytes(r.payload)
        kind = multimodal.sniff_kind(b)
        expected = {0: "png", 1: "jpeg", 2: "riff", 3: "raw"}[r.doc_id % 4]
        assert kind == expected, (r.doc_id, kind)


def test_sniff_digest_matches_python(payload_df):
    got = {r.doc_id: r for r in multimodal.sniff_media(payload_df).collect()}
    for r in payload_df.collect():
        b = bytes(r.payload)
        s = got[r.doc_id]
        assert s.n_bytes == len(b)
        assert s.digest == hashlib.md5(b.hex().upper().encode()).hexdigest()


def test_decode_stub_dimensions_deterministic(payload_df):
    out = multimodal.decode_image_stub(payload_df).collect()
    assert out
    for r in out:
        assert 16 <= r.width < 1024 and 16 <= r.height < 1024
        assert r.n_pixels == r.width * r.height
        assert r.channels == (4 if r.kind == "png" else 3)


# --------------------------------------------------------- real PNG decode

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def write_png(px, color_type: int, filters=None, palette=None) -> bytes:
    """Minimal PNG writer for decoder tests: ``px`` is an (h, w, bpp) or
    (h, w) uint8 array (indices for color type 3); per-row filter types
    exercise the decoder's defiltering (inverse filters applied here)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, bpp = px.shape
    filters = filters or [0] * h
    flat = px.reshape(h, w * bpp).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        ft = filters[r]
        cur = flat[r]
        prev = flat[r - 1] if r else np.zeros(w * bpp, dtype=np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = bytearray(bytes.fromhex("89504E470D0A1A0A"))
    out += _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", bytes(palette))
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


@pytest.mark.parametrize("color_type,bpp", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filters", [
    None, [1, 2, 3, 4, 0, 1, 2, 3, 4, 1, 2, 3],
])
def test_decode_png_matches_ground_truth(color_type, bpp, filters):
    import numpy as np

    rng = np.random.default_rng(color_type * 10 + (0 if filters is None else 1))
    h, w = 12, 9
    px = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
    blob = write_png(px, color_type, filters)
    gw, gh, gc, gmean = multimodal.decode_png(blob)
    assert (gw, gh, gc) == (w, h, bpp)
    assert abs(gmean - float(px.mean()) / 255.0) < 1e-12


def test_decode_png_palette():
    import numpy as np

    palette = bytes(range(48))  # 16 RGB entries
    idx = np.arange(60, dtype=np.uint8).reshape(6, 10) % 16
    blob = write_png(idx, 3, palette=palette)
    w, h, c, mean = multimodal.decode_png(blob)
    assert (w, h, c) == (10, 6, 3)
    rgb = np.frombuffer(palette, np.uint8).reshape(16, 3)[idx.reshape(-1)]
    assert abs(mean - float(rgb.mean()) / 255.0) < 1e-12


def test_decode_png_honest_gates():
    import struct
    import zlib

    with pytest.raises(ValueError, match="magic"):
        multimodal.decode_png(b"not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    blob = (bytes.fromhex("89504E470D0A1A0A") + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_png(blob)


def test_decode_real_png_through_spark(spark):
    """real=True must decode synthetic PNGs without PIL: true dims,
    channels, pixel mean; non-PNG payloads yield null dimensions."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    truth = {}
    for i in range(6):
        w, h = 5 + i, 8 + i
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        truth[i] = (w, h, 3, float(px.mean()) / 255.0)
        rows.append((i, bytearray(write_png(px, 2))))
    rows.append((99, bytearray(b"\xFF\xD8\xFFjpegish")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.decode_image_stub(df, real=True).collect()}
    for i, (w, h, c, m) in truth.items():
        r = got[i]
        assert (r.width, r.height, r.channels, r.n_pixels) == (w, h, c, w * h)
        assert abs(r.px_mean - m) < 1e-9
    assert got[99].width is None and got[99].kind == "jpeg"


def test_frame_sample_expansion(payload_df):
    fb, k = 16, 2
    out = multimodal.frame_sample(payload_df, frame_bytes=fb, every_k=k)
    counts = {r.doc_id: r.n for r in
              out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for r in payload_df.collect():
        n_frames = len(bytes(r.payload)) // fb
        expected = len(range(0, n_frames, k))
        assert counts.get(r.doc_id, 0) == expected
    # frame indices are the sampled ones only
    idxs = {r.frame_idx for r in out.collect()}
    assert all(i % k == 0 for i in idxs)


def test_embed_media_shape_and_determinism(payload_df):
    a = multimodal.embed_media(payload_df, dim=8).collect()
    b = multimodal.embed_media(payload_df, dim=8).collect()
    assert {r.doc_id: r.embedding for r in a} == {r.doc_id: r.embedding for r in b}
    for r in a:
        assert len(r.embedding) == 8
        assert all(0.0 <= v <= 1.0 for v in r.embedding)


def write_jpeg_headers(w: int, h: int, nc: int = 3, sof: int = 0xC2,
                       fill: bool = False, rst: bool = False) -> bytes:
    """Minimal JPEG marker stream (T.81 §B) up through SOS: SOI, APP0
    (JFIF), COM, DQT, optional fill bytes / standalone TEM, SOFn, EOI.
    Enough for a dimensions scan; no entropy data."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFE, b"synthetic")                       # COM
    out += seg(0xDB, bytes([0]) + bytes(64))             # DQT
    if fill:
        out += b"\xff\xff\xff"                           # legal fill bytes
    if rst:
        out += b"\xff\x01"                               # TEM (standalone)
    body = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        body += bytes([c + 1, 0x11, 0])
    out += seg(sof, body)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("sof", [0xC0, 0xC1, 0xC2])
@pytest.mark.parametrize("fill,rst", [(False, False), (True, True)])
def test_decode_jpeg_dims(sof, fill, rst):
    b = write_jpeg_headers(640, 481, 3, sof=sof, fill=fill, rst=rst)
    assert multimodal.decode_jpeg_dims(b) == (640, 481, 3)
    b = write_jpeg_headers(17, 4000, 1, sof=sof)
    assert multimodal.decode_jpeg_dims(b) == (17, 4000, 1)


def test_decode_jpeg_dims_honest_gates():
    with pytest.raises(ValueError, match="SOI"):
        multimodal.decode_jpeg_dims(b"not a jpeg")
    with pytest.raises(ValueError, match="without SOF"):
        multimodal.decode_jpeg_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI only
    with pytest.raises(ValueError, match="zero dimension"):
        multimodal.decode_jpeg_dims(write_jpeg_headers(0, 10))


def test_decode_real_jpeg_through_spark(spark):
    """real=True returns true dims for JPEG payloads via the SOF scan
    (px_mean stays null — no entropy decode without a codec)."""
    rows = [(i, bytearray(write_jpeg_headers(100 + i, 200 + i, 3,
                                             sof=0xC2 if i % 2 else 0xC0)))
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.decode_image_stub(df, real=True).collect()}
    for i in range(4):
        r = got[i]
        assert r.kind == "jpeg"
        assert (r.width, r.height, r.channels) == (100 + i, 200 + i, 3)
        assert r.n_pixels == (100 + i) * (200 + i)
        assert r.px_mean is None
