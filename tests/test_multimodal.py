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


# -------------------------------------------------- real GIF / BMP headers

def write_gif(w: int, h: int, n_frames: int = 1, gct: bool = True) -> bytes:
    """Minimal GIF89a writer: logical screen descriptor (+ optional
    2-entry global color table), a graphics-control extension per frame,
    image descriptors with a tiny fake LZW sub-block, trailer."""
    import struct

    out = bytearray(b"GIF89a")
    packed = 0x80 if gct else 0  # GCT flag, size bits 0 -> 2 entries
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    if gct:
        out += bytes(6)  # 2 RGB entries
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"       # GCE + terminator
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x02\x03\x84\x8f\xa9\x00"               # LZW min + 1 sub-block
    out += b"\x3b"
    return bytes(out)


def write_bmp(w: int, h: int, bits: int = 24, core: bool = False) -> bytes:
    """Minimal BMP writer: 'BM' file header + BITMAPINFOHEADER (or the
    12-byte OS/2 core header); no pixel data needed for a header parse."""
    import struct

    if core:
        dib = struct.pack("<IHHHH", 12, w, h, 1, bits)
    else:
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, 0, 0, 0, 0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + len(dib)) + dib


def test_decode_gif():
    assert multimodal.decode_gif(write_gif(320, 200)) == (320, 200, 1)
    assert multimodal.decode_gif(write_gif(12, 7, n_frames=5)) == (12, 7, 5)
    assert multimodal.decode_gif(write_gif(9, 9, gct=False)) == (9, 9, 1)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_gif(b"GIF99a??")
    with pytest.raises(ValueError, match="without image"):
        multimodal.decode_gif(write_gif(4, 4, n_frames=0))


def test_decode_bmp_dims():
    assert multimodal.decode_bmp_dims(write_bmp(640, 480)) == (640, 480, 3)
    assert multimodal.decode_bmp_dims(write_bmp(31, 17, bits=32)) == (31, 17, 4)
    assert multimodal.decode_bmp_dims(write_bmp(8, 8, bits=8)) == (8, 8, 1)
    assert multimodal.decode_bmp_dims(write_bmp(5, 6, core=True)) == (5, 6, 3)
    import struct
    topdown = bytearray(write_bmp(10, 20))
    struct.pack_into("<i", topdown, 22, -20)  # negative height = top-down
    assert multimodal.decode_bmp_dims(bytes(topdown)) == (10, 20, 3)
    with pytest.raises(ValueError, match="magic"):
        multimodal.decode_bmp_dims(b"notbmp")


def test_decode_real_gif_bmp_through_spark(spark):
    rows = [(0, bytearray(write_gif(33, 44, n_frames=2))),
            (1, bytearray(write_bmp(55, 66, bits=32)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.decode_image_stub(df, real=True).collect()}
    assert (got[0].kind, got[0].width, got[0].height, got[0].channels) == (
        "gif", 33, 44, 3)
    assert (got[1].kind, got[1].width, got[1].height, got[1].channels) == (
        "bmp", 55, 66, 4)
    # write_gif's placeholder LZW block may or may not decode (garbage
    # in, garbage out — dims come from the header either way); the
    # pixel-less BMP must fall back to the dims-only path
    assert got[1].px_mean is None


# ----------------------------------------------------------- real WAV decode

def write_wav(samples, rate: int = 16000, n_ch: int = 1,
              bits: int = 16, tag: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: fmt + data chunks, PCM int or float32."""
    import struct

    import numpy as np

    x = np.asarray(samples)
    if tag == 3:
        bits = 32
        data = x.astype("<f4").tobytes()
    elif bits == 8:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes()
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * n_ch * bits // 8,
                      n_ch * bits // 8, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_known_signal():
    import numpy as np

    t = np.arange(1600) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    ch, rate, ns, dur, rms = multimodal.decode_wav(write_wav(x, 16000))
    assert (ch, rate, ns) == (1, 16000, 1600)
    assert abs(dur - 0.1) < 1e-12
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2); 16-bit quantization noise
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    # float32 path carries the exact values
    _, _, _, _, rms32 = multimodal.decode_wav(write_wav(x, 16000, tag=3))
    assert abs(rms32 - float(np.sqrt(np.mean(x * x)))) < 1e-6


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_decode_wav_widths_and_stereo(bits):
    import numpy as np

    x = np.linspace(-0.9, 0.9, 400)
    ch, rate, ns, dur, rms = multimodal.decode_wav(
        write_wav(x, 8000, n_ch=2, bits=bits))
    assert (ch, rate, ns) == (2, 8000, 200)
    assert abs(dur - 0.025) < 1e-12
    assert abs(rms - float(np.sqrt(np.mean(x * x)))) < 2e-2


def test_decode_wav_honest_gates():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        multimodal.decode_wav(b"RIFFxxxxAVI LIST")
    import struct
    fmt = struct.pack("<HHIIHH", 85, 1, 44100, 0, 0, 0)  # mp3-in-wav tag
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="unsupported"):
        multimodal.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_stats_real_through_spark(spark):
    import numpy as np

    x = 0.25 * np.sin(np.arange(800) * 0.05)
    rows = [(0, bytearray(write_wav(x, 8000))),
            (1, bytearray(b"\x89PNG\r\n\x1a\nnot audio"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.audio_stats(df, real=True).collect()}
    assert (got[0].kind, got[0].n_channels, got[0].sample_rate,
            got[0].n_samples) == ("riff", 1, 8000, 800)
    assert abs(got[0].duration_s - 0.1) < 1e-12
    assert abs(got[0].rms - float(np.sqrt(np.mean(x * x)))) < 1e-3
    assert got[1].kind == "png" and got[1].rms is None


def test_audio_stats_stub_deterministic(payload_df):
    out = multimodal.audio_stats(payload_df).collect()
    assert out
    for r in out:
        assert r.n_channels in (1, 2)
        assert 8000 <= r.sample_rate < 48000
        assert abs(r.duration_s - r.n_samples / r.sample_rate) < 1e-12


# ------------------------------------------------------- real MP4 metadata

def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body) + 8) + typ + body


def write_mp4(duration_s: float, timescale: int = 1000, w: int = 0,
              h: int = 0, n_tracks: int = 1, version: int = 0) -> bytes:
    """Minimal ISO BMFF writer: ftyp + moov(mvhd + n trak(tkhd))."""
    import struct

    if version == 1:
        mvhd = (b"\x01" + bytes(3) + bytes(16)
                + struct.pack(">I", timescale)
                + struct.pack(">Q", int(duration_s * timescale)) + bytes(80))
    else:
        mvhd = (b"\x00" + bytes(3) + bytes(8)
                + struct.pack(">II", timescale, int(duration_s * timescale))
                + bytes(80))
    traks = b""
    for i in range(n_tracks):
        tail = struct.pack(">II", (w if i == 0 else 0) << 16,
                           (h if i == 0 else 0) << 16)
        # spec layout (ISO 14496-12 §8.3.2): verflags + 20|32 bytes of
        # times/track-id/reserved/duration + reserved(8) + layer/alt/
        # volume/reserved(8) + matrix(36) → dims at body+76 (v0) / +88 (v1)
        if version == 1:
            tkhd = b"\x01" + bytes(3) + bytes(32 + 8 + 8 + 36) + tail
        else:
            tkhd = b"\x00" + bytes(3) + bytes(20 + 8 + 8 + 36) + tail
        traks += _box(b"trak", _box(b"tkhd", tkhd))
    return (_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + _box(b"moov", _box(b"mvhd", mvhd) + traks))


@pytest.mark.parametrize("version", [0, 1])
def test_decode_mp4(version):
    b = write_mp4(12.5, 600, w=1920, h=1080, n_tracks=2, version=version)
    dur, w, h, nt = multimodal.decode_mp4(b)
    assert abs(dur - 12.5) < 1e-9
    assert (w, h, nt) == (1920, 1080, 2)
    # audio-only: no dims
    dur, w, h, nt = multimodal.decode_mp4(write_mp4(3.0, 1000))
    assert abs(dur - 3.0) < 1e-9 and (w, h, nt) == (None, None, 1)
    with pytest.raises(ValueError, match="ftyp"):
        multimodal.decode_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="mvhd"):
        multimodal.decode_mp4(_box(b"ftyp", b"isom") + _box(b"moov", b""))


def test_video_meta_real_through_spark(spark):
    rows = [(0, bytearray(write_mp4(7.25, 800, w=640, h=360, n_tracks=2))),
            (1, bytearray(b"\xFF\xD8\xFFnot video"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.video_meta(df, real=True).collect()}
    assert got[0].kind == "mp4"
    assert abs(got[0].duration_s - 7.25) < 1e-9
    assert (got[0].width, got[0].height, got[0].n_tracks) == (640, 360, 2)
    assert got[1].kind == "jpeg" and got[1].duration_s is None


def test_sniff_new_kinds():
    assert multimodal.sniff_kind(write_gif(4, 4)) == "gif"
    assert multimodal.sniff_kind(write_bmp(4, 4)) == "bmp"
    assert multimodal.sniff_kind(write_mp4(1.0)) == "mp4"
    assert multimodal.sniff_kind(write_wav([0.0] * 8)) == "riff"
    assert multimodal.sniff_kind(b"plain text") == "raw"


# --------------------------------------------- real GIF/BMP pixel decode

def gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """Independent GIF LZW encoder (LSB-first variable-width codes) for
    decoder round-trip tests."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bits = []

    def emit(code, size):
        bits.append((code, size))

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prev = b""
    for c in indices:
        cur = prev + bytes([c])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([c])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    acc = nbits = 0
    out = bytearray()
    for code, size in bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def write_real_gif(idx, palette, min_code_size: int = None) -> bytes:
    """GIF89a with REAL LZW pixel data: ``idx`` is an (h, w) uint8 index
    array, ``palette`` a list of (r, g, b)."""
    import struct

    import numpy as np

    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    ncol = len(palette)
    size_bits = max(1, (ncol - 1).bit_length())
    mcs = min_code_size or max(2, size_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    for i in range(1 << size_bits):
        r, g, b = palette[i] if i < ncol else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([mcs])
    data = gif_lzw_encode(idx.reshape(-1).tolist(), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_lzw_pixel_decode():
    import numpy as np

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, (13, 22), dtype=np.uint8)
    blob = write_real_gif(idx, palette)
    w, h, c, mean = multimodal.decode_gif_pixels(blob)
    assert (w, h, c) == (22, 13, 3)
    truth = np.array(palette, dtype=np.float64)[idx.reshape(-1)]
    assert abs(mean - float(truth.mean()) / 255.0) < 1e-9


def test_gif_lzw_long_stream_code_growth():
    import numpy as np

    # enough distinct runs to force several code-size bumps
    palette = [(i * 8 % 256, i * 5 % 256, i * 3 % 256) for i in range(16)]
    rng = np.random.default_rng(12)
    idx = rng.integers(0, 16, (40, 60), dtype=np.uint8)
    blob = write_real_gif(idx, palette)
    w, h, c, mean = multimodal.decode_gif_pixels(blob)
    assert (w, h) == (60, 40)
    truth = np.array(palette, dtype=np.float64)[idx.reshape(-1)]
    assert abs(mean - float(truth.mean()) / 255.0) < 1e-9


def write_bmp_with_pixels(px) -> bytes:
    """BMP writer with a real BI_RGB pixel array: ``px`` is (h, w, 3)
    RGB uint8 (stored bottom-up as BGR with 4-byte row padding)."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for r in range(h - 1, -1, -1):
        row = px[r][:, ::-1].tobytes()  # RGB → BGR
        rows += row + bytes(stride - len(row))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    off = 14 + len(dib)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    return hdr + dib + bytes(rows)


def test_bmp_pixel_decode():
    import numpy as np

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    w, h, c, mean = multimodal.decode_bmp_pixels(write_bmp_with_pixels(px))
    assert (w, h, c) == (14, 9, 3)
    assert abs(mean - float(px.mean()) / 255.0) < 1e-9


def test_real_gif_bmp_px_mean_through_spark(spark):
    import numpy as np

    palette = [(0, 0, 0), (255, 255, 255)]
    idx = (np.indices((8, 8)).sum(axis=0) % 2).astype(np.uint8)  # checker
    rng = np.random.default_rng(14)
    bpx = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    rows = [(0, bytearray(write_real_gif(idx, palette))),
            (1, bytearray(write_bmp_with_pixels(bpx)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.decode_image_stub(df, real=True).collect()}
    assert got[0].px_mean == pytest.approx(0.5)
    assert got[1].px_mean == pytest.approx(float(bpx.mean()) / 255.0)


# ------------------------------------------- real MJPEG-AVI frame decode

def write_mjpeg_avi(frames_px) -> bytes:
    """Minimal MJPEG AVI: RIFF('AVI ') with an hdrl LIST and a movi LIST
    of 00dc chunks, each a real baseline JPEG from tests/jpeg_synth."""
    import struct

    from tests.jpeg_synth import encode_jpeg

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def list_(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    h, w = frames_px[0].shape[:2]
    avih = struct.pack("<14I", 33333, 0, 0, 0, len(frames_px), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, 30, 0, len(frames_px), 0, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    hdrl = list_(b"hdrl", chunk(b"avih", avih)
                 + list_(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = list_(b"movi", b"".join(
        chunk(b"00dc", encode_jpeg(px)) for px in frames_px))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frames_walk():
    import numpy as np

    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (16, 24), np.uint8) for _ in range(5)]
    blob = write_mjpeg_avi(frames)
    assert multimodal.sniff_kind(blob) == "riff"
    got = multimodal.avi_mjpeg_frames(blob)
    assert len(got) == 5
    for f in got:
        assert f.startswith(b"\xff\xd8")  # each chunk is a whole JPEG
    with pytest.raises(ValueError, match="AVI"):
        multimodal.avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_sample_real_avi(spark):
    import numpy as np

    rng = np.random.default_rng(32)
    frames = [rng.integers(0, 256, (8, 8), np.uint8) for _ in range(6)]
    blob = write_mjpeg_avi(frames)
    df = spark.createDataFrame([(0, bytearray(blob))],
                               "doc_id long, payload binary")
    out = multimodal.frame_sample(df, every_k=2, real=True).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] \
        == [0, 2, 4]
    # digests are of the REAL jpeg chunk bytes
    import hashlib as _h
    fr = multimodal.avi_mjpeg_frames(blob)
    expect = _h.md5(fr[2].hex().upper().encode()).hexdigest()
    assert [r.frame_digest for r in out if r.frame_idx == 2] == [expect]


def test_frame_pixel_stats_real_decode(spark):
    import numpy as np

    rng = np.random.default_rng(33)
    frames = [rng.integers(0, 256, (16, 24), np.uint8) for _ in range(3)]
    blob = write_mjpeg_avi(frames)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(b"not a video"))],
        "doc_id long, payload binary")
    out = multimodal.frame_pixel_stats(df).collect()
    vids = sorted([r for r in out if r.doc_id == 0],
                  key=lambda r: r.frame_idx)
    assert len(vids) == 3
    for r, px in zip(vids, frames):
        assert (r.width, r.height) == (24, 16)
        assert abs(r.px_mean - float(px.mean()) / 255.0) < 0.005
    nulls = [r for r in out if r.doc_id == 1]
    assert len(nulls) == 1 and nulls[0].width is None


def test_decode_bmp_pixels_gates_unsupported_depths():
    """16-bit RGB555 and 4-bit paletted payloads must be rejected (the
    8/24/32 stride math would silently average garbage), falling back to
    dims-only."""
    for bits in (16, 4, 1):
        with pytest.raises(ValueError, match="bit depth"):
            multimodal.decode_bmp_pixels(write_bmp(4, 4, bits=bits))


# ------------------------------------------------- H.264/H.265 SPS parse

def test_h264_sps_round_trip():
    for w, h, pf in ((1920, 1072, 66), (320, 176, 100), (640, 480, 77)):
        assert multimodal.parse_h264_sps(
            multimodal.write_h264_sps(w, h, pf)) == (pf, w, h)


def test_h264_sps_cropping():
    """Hand-built SPS with frame cropping: 1920x1080 = 1920x1088 coded
    minus 8 bottom luma rows (crop_bottom=4 in 2-sample chroma units)."""
    W = multimodal._EGWriter()
    W.u(66, 8).u(0, 8).u(30, 8)
    W.ue(0).ue(0).ue(2).ue(1).u(0, 1)
    W.ue(1920 // 16 - 1).ue(1088 // 16 - 1)
    W.u(1, 1).u(1, 1)
    W.u(1, 1)                      # frame_cropping_flag
    W.ue(0).ue(0).ue(0).ue(4)      # left/right/top/bottom
    W.u(0, 1)
    assert multimodal.parse_h264_sps(b"\x67" + W.bytes()) == (66, 1920, 1080)


def test_h265_sps_round_trip():
    for w, h, pf in ((1921, 1081, 1), (640, 360, 2)):
        assert multimodal.parse_h265_sps(
            multimodal.write_h265_sps(w, h, pf)) == (pf, w, h)


def test_sps_rejects_wrong_nal_type():
    with pytest.raises(ValueError, match="H.264 SPS"):
        multimodal.parse_h264_sps(b"\x68\x00\x00")
    with pytest.raises(ValueError, match="H.265 SPS"):
        multimodal.parse_h265_sps(b"\x40\x01\x00")


def test_emulation_prevention_stripping():
    """An SPS whose RBSP contains 00 00 03 sequences must parse the
    de-escaped payload."""
    sps = multimodal.write_h264_sps(256, 144)
    rbsp = sps[1:]
    escaped = rbsp.replace(b"\x00\x00", b"\x00\x00\x03")
    # only meaningful if escaping actually occurred
    if escaped != rbsp:
        assert multimodal.parse_h264_sps(b"\x67" + escaped) == (66, 256, 144)


def test_video_mp4_sps_dims_via_decode_mp4():
    """Container with zeroed tkhd and sample-entry dims: width/height
    must come from the SPS bit parse for both codecs."""
    for codec, w, h in (("h264", 1280, 720), ("h265", 1924, 1080)):
        dur, gw, gh, nt = multimodal.decode_mp4(
            multimodal.write_video_mp4(w, h, codec))
        assert (gw, gh, nt) == (w, h, 1)
        assert abs(dur - 2.0) < 1e-9


def test_video_meta_real_sps_through_spark(spark):
    rows = [(0, bytearray(multimodal.write_video_mp4(320, 176, "h264"))),
            (1, bytearray(multimodal.write_video_mp4(1924, 1080, "h265"))),
            (2, bytearray(b"not a video"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           multimodal.video_meta(df, real=True).collect()}
    assert (got[0].width, got[0].height) == (320, 176)
    assert (got[1].width, got[1].height) == (1924, 1080)
    assert got[2].width is None and got[2].kind == "raw"


def test_decode_bmp_rle8():
    """BI_RLE8: runs, absolute mode (word padding), EOL, delta skip and
    EOB must reproduce the uncompressed 8-bit decode exactly."""
    import struct

    import numpy as np

    w, h = 10, 4
    pal = bytes(v for i in range(16) for v in (i * 16, i * 16, i * 16, 0))
    # rows (bottom-up order in the file)
    rle = bytearray()
    rle += bytes([10, 3, 0, 0])                 # row0: 10×3, EOL
    rle += bytes([4, 5, 0, 3, 7, 8, 9, 0, 3, 1, 0, 0])
    # row1: 4×5, absolute run of 3 (7,8,9 + pad), 3×1, EOL
    rle += bytes([2, 2, 0, 2, 3, 1, 5, 4, 0, 0])  # row2: 2×2, delta(+3,+1)
    # delta jumps into row3; remaining of row2 stays index 0
    rle += bytes([0, 1])                        # EOB
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle),
                      0, 0, 16, 0)
    off = 14 + 40 + len(pal)
    blob = (b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
            + dib + pal + bytes(rle))
    gw, gh, gc, gmean = multimodal.decode_bmp_pixels(blob)
    assert (gw, gh, gc) == (w, h, 3)
    # python reference
    idx = np.zeros((h, w), np.uint8)
    idx[0, :] = 3
    idx[1, :4] = 5
    idx[1, 4:7] = [7, 8, 9]
    idx[1, 7:10] = 1
    idx[2, :2] = 2
    idx[3, 2 + 3:2 + 3 + 5] = 4  # delta target row/col, then 5×4 run
    want = float(np.repeat((np.clip(idx, 0, 15) * 16)[..., None], 3,
                           axis=2).mean()) / 255.0
    assert gmean == pytest.approx(want, abs=1e-9)


def test_decode_wav_ima_adpcm():
    """IMA ADPCM (format 0x11): encode a sine with a reference
    encoder, decode must track it closely; stereo stays gated."""
    import math
    import struct

    import numpy as np

    steps = multimodal._IMA_STEPS
    index_tab = multimodal._IMA_INDEX

    def encode(samples, block_samples=505):
        blocks = b""
        i = 0
        while i < len(samples):
            chunk = samples[i:i + block_samples]
            pred = int(chunk[0])
            idx = 0
            nibs = []
            for sample in chunk[1:]:
                step = steps[idx]
                delta = int(sample) - pred
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # decoder-mirror update
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                pred = max(-32768, min(32767, pred + diff))
                idx = max(0, min(88, idx + index_tab[nib & 7]))
                nibs.append(nib)
            if len(nibs) % 2:
                nibs.append(0)
            body = bytes(nibs[j] | (nibs[j + 1] << 4)
                         for j in range(0, len(nibs), 2))
            blocks += struct.pack("<hBB", int(chunk[0]), 0, 0) + body
            i += block_samples
        return blocks, 4 + (block_samples - 1 + 1) // 2

    rate = 8000
    t = np.arange(1010)
    sig = (12000 * np.sin(2 * math.pi * 440 * t / rate)).astype(int)
    data, align = encode(sig)
    fmt = struct.pack("<HHIIHH", 0x11, 1, rate, rate, align, 4)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    n_ch, r, n, dur, rms = multimodal.decode_wav(blob)
    assert (n_ch, r) == (1, rate)
    assert n == len(sig)
    want_rms = float(np.sqrt(np.mean((sig / 32768.0) ** 2)))
    assert abs(rms - want_rms) / want_rms < 0.05  # ADPCM is lossy
    # stereo ADPCM stays honestly gated
    fmt2 = struct.pack("<HHIIHH", 0x11, 2, rate, rate, align, 4)
    blob2 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt2) + 8 + len(data))
             + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
             + b"data" + struct.pack("<I", len(data)) + data)
    with pytest.raises(ValueError, match="mono"):
        multimodal.decode_wav(blob2)
