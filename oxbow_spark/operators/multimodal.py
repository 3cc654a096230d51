"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns with typed metadata. All
per-payload work runs in Arrow-batched ``mapInPandas`` passes — narrow
(no shuffle), partition-parallel, and batch-vectorized: at 100 TB each
task streams pandas batches of (id, payload) and never materializes the
whole partition. Real codecs (PIL/ffmpeg/torchaudio) are not available in
this container, so the decode kernels are clearly-marked deterministic
stubs behind the exact UDF signature a real decoder would use — swapping
one in changes only the inner per-batch function, not the plan, schema,
partitioning, or batch shape.

The reference (abdenlab/oxbow) has no multimodal layer; this extends the
engine per the training-data-pipeline brief. Digests are md5 over the
uppercase-hex rendering of the payload so the DuckDB oracle (whose md5
only accepts VARCHAR) can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real image decode path — absent in this container
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# (kind, magic-byte prefix) sniff table, checked in order. The DuckDB
# oracle mirrors this CASE arm-for-arm (`queries/registry.py:_SNIFF_SQL_CASE`)
# — keep both in sync when extending.
MAGICS: list[tuple[str, bytes]] = [
    ("png", bytes.fromhex("89504E470D0A1A0A")),
    ("jpeg", bytes.fromhex("FFD8FF")),
    ("riff", b"RIFF"),
    ("gif", b"GIF8"),
    ("bmp", b"BM"),
]


def sniff_kind(b: bytes) -> str:
    for kind, magic in MAGICS:
        if b.startswith(magic):
            return kind
    if len(b) >= 12 and b[4:8] == b"ftyp":  # ISO BMFF (mp4/mov): sized box
        return "mp4"
    return "raw"


def _hex_digest(b: bytes) -> str:
    return hashlib.md5(b.hex().upper().encode()).hexdigest()


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary): deterministic synthetic media payloads built
    from a text column — a format magic header (cycling png/jpeg/riff/none
    by id) followed by the UTF-8 bytes. Stands in for real media bytes in
    tests and oracle checks; production tables would carry real payloads
    in the same column shape."""
    m = F.col(id_col) % 4
    hdr = (
        F.when(m == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(m == 1, F.unhex(F.lit("FFD8FF")))
        .when(m == 2, F.encode(F.lit("RIFF"), "UTF-8"))
        .otherwise(F.unhex(F.lit("")))
    )
    return df.select(
        F.col(id_col),
        F.concat(hdr, F.encode(F.col(text_col), "UTF-8")).alias("payload"),
    )


def sniff_media(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """(id, kind, n_bytes, digest): magic-byte sniff + size + content
    digest per payload. One mapInPandas pass, no shuffle."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "kind": [sniff_kind(b) for b in payloads],
                "n_bytes": [len(b) for b in payloads],
                "digest": [_hex_digest(b) for b in payloads],
            })

    return df.mapInPandas(fn, schema)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}  # color type → reported channels


def decode_png(b: bytes) -> tuple[int, int, int, float]:
    """Pure-stdlib PNG decode → (width, height, channels, px_mean).

    Full decode: chunk walk, zlib-inflated IDAT, per-row defiltering
    (None/Sub/Up/Average/Paeth; Sub vectorized as a per-lane modular
    cumsum, Up as one row add, Average/Paeth pixel-stepped with numpy
    lanes), palette expansion for color type 3. ``px_mean`` is the mean
    of all channel samples / 255. Supported: 8-bit depth, color types
    0/2/3/4/6, non-interlaced — the shapes PIL-free pipelines actually
    emit; 1/2/4/16-bit depths and Adam7 raise ValueError (honest gate,
    not silent garbage). Public format: PNG spec (RFC 2083 / ISO 15948).
    """
    import struct
    import zlib

    import numpy as np

    if not b.startswith(MAGICS[0][1]):
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (ln,), typ = struct.unpack_from(">I", b, pos), b[pos + 4:pos + 8]
        pos += 8
        data = b[pos:pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG bit depth {bit_depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7 interlaced PNG unsupported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color_type} unsupported")
    bpp = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        cur = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else zero_prev.astype(np.int32)
        ft = ftypes[r]
        if ft == 0:
            row = cur
        elif ft == 1:  # Sub: per-lane modular prefix sum
            row = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif ft == 2:  # Up
            row = (cur + prev) & 0xFF
        elif ft == 3:  # Average: pixel-stepped, channel lanes vectorized
            row = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                left = (cur[x:x + bpp] + ((left + prev[x:x + bpp]) >> 1)) & 0xFF
                row[x:x + bpp] = left
        elif ft == 4:  # Paeth
            row = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                up = prev[x:x + bpp]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up, ul))
                left = (cur[x:x + bpp] + pred) & 0xFF
                row[x:x + bpp] = left
                ul = up
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
        out[r] = row.astype(np.uint8)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        out = palette[out.reshape(-1)]
    mean = float(out.mean()) / 255.0 if out.size else 0.0
    return int(w), int(h), _PNG_CHANNELS[color_type], mean


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOF0..15 minus DHT/JPG/DAC


def decode_jpeg_dims(b: bytes) -> tuple[int, int, int]:
    """Pure-stdlib JPEG dimension scan → (width, height, channels).

    Walks the marker-segment stream (ITU-T T.81 §B): after SOI each
    segment is 0xFF <marker> <u16 length incl. itself>; standalone
    markers (TEM, RSTn) have no length. The first SOFn frame header
    (baseline SOF0, progressive SOF2, and the other frame types except
    DHT/JPG/DAC which share the 0xCx space) carries
    precision/height/width/components — no entropy decode needed for
    dimensions. Raises ValueError on malformed streams (honest gate,
    matching `decode_png`)."""
    import struct

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at {pos}")
        pos += 1
        while pos < n and b[pos] == 0xFF:  # fill bytes are legal padding
            pos += 1
        if pos >= n:
            break
        marker = b[pos]
        pos += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: bare
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if pos + 2 > n:
            break
        (seg_len,) = struct.unpack_from(">H", b, pos)
        if seg_len < 2:
            raise ValueError("JPEG segment length < 2")
        if marker in _JPEG_SOF_MARKERS:
            if pos + 8 > n:
                raise ValueError("JPEG SOF truncated")
            _prec, h, w, nc = struct.unpack_from(">BHHB", b, pos + 2)
            if w == 0 or h == 0:
                raise ValueError("JPEG SOF with zero dimension")
            return int(w), int(h), int(nc)
        if marker == 0xDA:  # SOS: entropy data follows; SOF must precede
            break
        pos += seg_len
    raise ValueError("JPEG without SOF frame header")


def decode_gif(b: bytes) -> tuple[int, int, int]:
    """Pure-stdlib GIF parse → (width, height, n_frames).

    GIF87a/89a (public spec, W3C/CompuServe): 6-byte signature, logical
    screen descriptor (canvas w/h as LE u16, packed flags carrying the
    global color table size), then a block stream — 0x21 extensions and
    0x2C image descriptors, both trailed by length-prefixed sub-blocks,
    until the 0x3B trailer. Frame count = image descriptors seen; the
    walk skips local color tables and LZW data without decoding them.
    Raises ValueError on malformed streams (honest gate)."""
    import struct

    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        raise ValueError("not a GIF (bad signature)")
    if len(b) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    w, h, packed = struct.unpack_from("<HHB", b, 6)
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))

    def _skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise ValueError("GIF sub-blocks truncated")
            ln = b[p]
            p += 1 + ln
            if ln == 0:
                return p

    frames = 0
    while pos < len(b):
        tag = b[pos]
        pos += 1
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label byte + sub-blocks
            pos = _skip_subblocks(pos + 1)
        elif tag == 0x2C:  # image descriptor
            if pos + 9 > len(b):
                raise ValueError("GIF image descriptor truncated")
            lpacked = b[pos + 8]
            pos += 9
            if lpacked & 0x80:  # local color table
                pos += 3 * (2 << (lpacked & 0x07))
            pos = _skip_subblocks(pos + 1)  # LZW min code size + data
            frames += 1
        else:
            raise ValueError(f"GIF unknown block 0x{tag:02x}")
    if frames == 0:
        raise ValueError("GIF without image descriptors")
    return int(w), int(h), frames


def _gif_lzw_decode(min_code_size: int, data: bytes, npix: int) -> "list[int]":
    """GIF variable-width LZW decode (LSB-first bit packing) → pixel
    index list, truncated/padded handling left to the caller."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(dictionary) and code not in (clear, end):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF LZW code out of range")
            out.extend(entry)
            if prev is not None:
                dictionary.append(prev + entry[:1])
                if len(dictionary) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= npix:
                return out[:npix]
    return out


def decode_gif_pixels(b: bytes) -> tuple[int, int, int, float]:
    """Real first-frame GIF decode → (width, height, 3, px_mean).

    Full LZW decompression of the first image descriptor's data, mapped
    through the active (local or global) color table; ``px_mean`` is the
    mean of the frame's RGB samples / 255 (row order — and thus the
    interlace flag — is irrelevant to a mean). Transparency is ignored:
    the transparent index still carries its palette color."""
    import struct

    import numpy as np

    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        raise ValueError("not a GIF (bad signature)")
    if len(b) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    _w, _h, packed = struct.unpack_from("<HHB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * ncol], np.uint8).reshape(-1, 3)
        pos += 3 * ncol
    while pos < len(b):
        tag = b[pos]
        pos += 1
        if tag == 0x3B:
            break
        if tag == 0x21:
            pos += 1
            while True:
                ln = b[pos]
                pos += 1 + ln
                if ln == 0:
                    break
        elif tag == 0x2C:
            _x, _y, fw, fh, lpacked = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            pal = gct
            if lpacked & 0x80:
                ncol = 2 << (lpacked & 0x07)
                pal = np.frombuffer(b[pos:pos + 3 * ncol], np.uint8).reshape(-1, 3)
                pos += 3 * ncol
            if pal is None:
                raise ValueError("GIF frame without color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while True:
                ln = b[pos]
                pos += 1
                data += b[pos:pos + ln]
                pos += ln
                if ln == 0:
                    break
            idx = _gif_lzw_decode(min_code, bytes(data), fw * fh)
            if not idx:
                raise ValueError("GIF frame decoded to zero pixels")
            rgb = pal[np.clip(np.array(idx, dtype=np.int64), 0, len(pal) - 1)]
            return int(fw), int(fh), 3, float(rgb.mean()) / 255.0
        else:
            raise ValueError(f"GIF unknown block 0x{tag:02x}")
    raise ValueError("GIF without image descriptors")


def decode_bmp_dims(b: bytes) -> tuple[int, int, int]:
    """Pure-stdlib BMP header parse → (width, height, channels).

    'BM' file header (14 bytes) + BITMAPINFOHEADER (or any later >=40-byte
    DIB header; the 12-byte OS/2 BITMAPCOREHEADER uses u16 dims): width
    i32 LE, height i32 LE (negative = top-down, reported as abs),
    channels = bit count / 8 (1 for paletted <=8-bit)."""
    import struct

    if not b.startswith(b"BM"):
        raise ValueError("not a BMP (bad magic)")
    if len(b) < 26:
        raise ValueError("BMP truncated before DIB header")
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size == 12:  # BITMAPCOREHEADER
        w, h, _planes, bits = struct.unpack_from("<HHHH", b, 18)
    elif hdr_size >= 40:
        w, h, _planes, bits = struct.unpack_from("<iiHH", b, 18)
    else:
        raise ValueError(f"BMP DIB header size {hdr_size} unsupported")
    if w <= 0 or h == 0:
        raise ValueError("BMP with non-positive dimension")
    return int(w), abs(int(h)), max(1, bits // 8)


def decode_bmp_pixels(b: bytes) -> tuple[int, int, int, float]:
    """Real BMP pixel decode → (width, height, channels, px_mean) for
    uncompressed (BI_RGB) 8/24/32-bit images: the pixel array starts at
    the file header's bfOffBits, rows are bottom-up and padded to 4
    bytes (row order is irrelevant to a mean); 8-bit indices map through
    the BGRA palette after the DIB header. Compressed (RLE/bitfields)
    variants raise ValueError — honest gate."""
    import struct

    import numpy as np

    w, h, channels = decode_bmp_dims(b)
    (off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    # true bit count from the DIB header — channels*8 would alias 1/4-bit
    # paletted (channels=1) to 8 and misread RGB555 strides
    if hdr_size == 12:
        (bits,) = struct.unpack_from("<H", b, 24)
    else:
        (bits,) = struct.unpack_from("<H", b, 28)
    if bits not in (8, 24, 32):
        # 1/4-bit paletted and 16-bit RGB555 payloads would misdecode
        # under the 8/24/32 stride math — honest gate, dims-only fallback
        raise ValueError(f"BMP bit depth {bits} unsupported (8/24/32 only)")
    compression = 0
    if hdr_size >= 40:
        (compression,) = struct.unpack_from("<I", b, 30)
    if compression == 1:
        if bits != 8:
            raise ValueError("BI_RLE8 requires an 8-bit BMP")
        return _decode_bmp_rle8(b, off, 14 + hdr_size, w, h)
    if compression != 0:
        raise ValueError(
            f"BMP compression {compression} unsupported (BI_RGB/BI_RLE8)")
    stride = (w * bits // 8 + 3) & ~3
    need = stride * h
    if off + need > len(b):
        raise ValueError("BMP pixel array truncated")
    raw = np.frombuffer(b[off:off + need], np.uint8).reshape(h, stride)
    if bits == 8:
        pal_off = 14 + hdr_size
        npal = (off - pal_off) // 4
        if npal <= 0:
            raise ValueError("8-bit BMP without palette")
        pal = np.frombuffer(b[pal_off:pal_off + 4 * npal], np.uint8).reshape(-1, 4)
        idx = raw[:, :w]
        rgb = pal[np.clip(idx, 0, npal - 1)][:, :, :3]  # BGRA → BGR slice
        return w, h, 3, float(rgb.mean()) / 255.0
    px = raw[:, :w * (bits // 8)].reshape(h, w, bits // 8)
    if bits == 32:
        px = px[:, :, :3]  # drop the X/alpha byte from the mean
    return w, h, channels, float(px.mean()) / 255.0


def _decode_bmp_rle8(b: bytes, off: int, pal_off: int,
                     w: int, h: int) -> tuple[int, int, int, float]:
    """BI_RLE8 (Windows BMP run-length) pixel decode: (count, value)
    runs, 0-escapes for end-of-line (0), end-of-bitmap (1), delta (2)
    and word-padded absolute runs; rows are bottom-up, skipped pixels
    keep palette index 0 (the GDI convention)."""
    import numpy as np

    npal = (off - pal_off) // 4
    if npal <= 0:
        raise ValueError("RLE8 BMP without palette")
    pal = np.frombuffer(b[pal_off:pal_off + 4 * npal],
                        np.uint8).reshape(-1, 4)
    idx = np.zeros((h, w), np.uint8)
    x = y = 0
    p = off
    n = len(b)
    while p + 1 < n and y < h:
        cnt = b[p]
        val = b[p + 1]
        p += 2
        if cnt > 0:
            e = min(x + cnt, w)
            idx[y, x:e] = val
            x = e
        elif val == 0:      # end of line
            x, y = 0, y + 1
        elif val == 1:      # end of bitmap
            break
        elif val == 2:      # delta
            if p + 2 > n:
                raise ValueError("RLE8 delta truncated")
            x = min(x + b[p], w)
            y = min(y + b[p + 1], h)
            p += 2
        else:               # absolute run of `val` indices, word-padded
            if p + val > n:
                raise ValueError("RLE8 absolute run truncated")
            e = min(x + val, w)
            take = e - x
            idx[y, x:e] = np.frombuffer(b, np.uint8, take, p)
            x = e
            p += val + (val & 1)
    rgb = pal[np.clip(idx, 0, npal - 1)][:, :, :3]
    return w, h, 3, float(rgb.mean()) / 255.0


def decode_image_stub(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id", real: bool = False) -> DataFrame:
    """(id, kind, width, height, channels, n_pixels, px_mean): image
    decode over Arrow-batched mapInPandas.

    ``real=False`` (default): deterministic STUB — dimensions and px_mean
    are pure functions of the byte length, so the full pipeline (schema,
    batching, downstream joins, the DuckDB oracle) is testable without
    codecs. ``real=True``: PNG payloads decode for REAL via the
    pure-stdlib `decode_png` (actual dimensions, channels and pixel
    mean); baseline AND progressive JPEGs decode fully via the
    pure-numpy Huffman+IDCT decoder (`operators/jpeg.py` — true
    px_mean), with the SOF dimension scan `decode_jpeg_dims` as the
    fallback for exotic frames (dims only); GIF uses the block-walk
    `decode_gif`, BMP `decode_bmp_dims` (px_mean null — LZW/RLE decode
    not implemented); other kinds use PIL when available, else yield
    null dimensions (same schema — swapping decoders never changes the
    plan)."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_mean", DoubleType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                kind = sniff_kind(b)
                n = len(b)
                if not real:
                    # STUB: everything is a pure function of payload size
                    w = 16 + (n * 7919) % 1008
                    h = 16 + (n * 104729) % 1008
                    c = 4 if kind == "png" else 3
                    rows.append((i, kind, w, h, c, w * h,
                                 ((n * 131) % 256) / 256.0))
                    continue
                decoded = None
                if kind == "png":
                    try:
                        decoded = decode_png(b)
                    except ValueError:
                        decoded = None  # sniffed PNG but not decodable
                elif kind == "jpeg":
                    # full baseline decode first (true px_mean); fall back
                    # to the SOF dimension scan for progressive/exotic frames
                    try:
                        from oxbow_spark.operators.jpeg import jpeg_pixel_stats
                        decoded = jpeg_pixel_stats(b)
                    except ValueError:
                        try:
                            jw, jh, jc = decode_jpeg_dims(b)
                            decoded = (jw, jh, jc, None)
                        except ValueError:
                            decoded = None
                elif kind == "gif":
                    # full first-frame LZW decode; dims-only fallback
                    try:
                        decoded = decode_gif_pixels(b)
                    except ValueError:
                        try:
                            gw, gh, _frames = decode_gif(b)
                            decoded = (gw, gh, 3, None)
                        except ValueError:
                            decoded = None
                elif kind == "bmp":
                    # real pixel mean for BI_RGB; dims-only fallback
                    try:
                        decoded = decode_bmp_pixels(b)
                    except ValueError:
                        try:
                            bw, bh, bc = decode_bmp_dims(b)
                            decoded = (bw, bh, bc, None)
                        except ValueError:
                            decoded = None
                if decoded is None and HAVE_PIL:
                    import io

                    try:
                        img = Image.open(io.BytesIO(b))
                        import numpy as _np

                        px = _np.asarray(img)
                        decoded = (img.width, img.height,
                                   px.shape[2] if px.ndim == 3 else 1,
                                   float(px.mean()) / 255.0)
                    except Exception:
                        decoded = None
                if decoded is None:
                    rows.append((i, kind, None, None, None, None, None))
                else:
                    w, h, c, m = decoded
                    rows.append((i, kind, w, h, c, w * h, m))
            yield pd.DataFrame(rows, columns=[
                id_col, "kind", "width", "height", "channels", "n_pixels",
                "px_mean"])

    return df.mapInPandas(fn, schema)


def avi_mjpeg_frames(b: bytes) -> "list[bytes]":
    """Pure-stdlib MJPEG-AVI frame extraction: RIFF 'AVI ' chunk walk
    into the 'movi' LIST, returning each compressed video frame chunk
    ('##dc'/'##db') payload — for MJPEG streams these are complete
    JPEGs, decodable by `operators/jpeg.py`. Raises ValueError on
    non-AVI payloads (honest gate)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            cid = b[pos:pos + 4]
            (ln,) = struct.unpack_from("<I", b, pos + 4)
            body_lo = pos + 8
            body_hi = min(body_lo + ln, hi)
            if cid == b"LIST":
                ltype = b[body_lo:body_lo + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(body_lo + 4, body_hi)
            elif cid[2:4] in (b"dc", b"db") and ln > 0:
                frames.append(b[body_lo:body_hi])
            pos = body_lo + ln + (ln & 1)  # word alignment

    walk(12, len(b))
    if not frames:
        raise ValueError("AVI without video frame chunks")
    return frames


def frame_sample(df: DataFrame, frame_bytes: int = 64, every_k: int = 2,
                 payload_col: str = "payload", id_col: str = "doc_id",
                 real: bool = False) -> DataFrame:
    """(id, frame_idx, frame_digest): video frame sampling — one → many
    rows per input, every k-th frame emitted. Digest = md5(hex(frame)).

    ``real=False`` (default): deterministic STUB — the payload is
    treated as ``n_bytes // frame_bytes`` fixed-size slices, so the
    expand shape and the DuckDB oracle are testable without codecs.
    ``real=True``: RIFF/AVI payloads yield their ACTUAL compressed
    video frame chunks via the pure-stdlib `avi_mjpeg_frames` walk
    (MJPEG frames are complete JPEGs — feed them to
    `frame_pixel_stats` for real pixel decode); non-AVI payloads fall
    back to the fixed-slice stub framing, same schema."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_digest", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if real:
                    try:
                        fr = avi_mjpeg_frames(b)
                        for j in range(0, len(fr), every_k):
                            ids.append(i)
                            idxs.append(j)
                            digs.append(hashlib.md5(
                                fr[j].hex().upper().encode()).hexdigest())
                        continue
                    except ValueError:
                        pass  # not an AVI: stub framing below
                hx = b.hex().upper()
                n_frames = len(b) // frame_bytes
                for j in range(0, n_frames, every_k):
                    ids.append(i)
                    idxs.append(j)
                    sl = hx[j * frame_bytes * 2:(j + 1) * frame_bytes * 2]
                    digs.append(hashlib.md5(sl.encode()).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_digest": digs})

    return df.mapInPandas(fn, schema)


def frame_pixel_stats(df: DataFrame, every_k: int = 1,
                      payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, frame_idx, width, height, px_mean): REAL per-frame pixel
    decode for MJPEG-AVI payloads — the RIFF walk yields each frame's
    JPEG bytes and `operators/jpeg.py` entropy-decodes them (baseline
    or progressive). Undecodable frames / non-AVI payloads yield a
    single null row per input (same schema, auditable)."""
    from oxbow_spark.operators.jpeg import jpeg_pixel_stats

    schema = StructType([
        StructField(id_col, LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("px_mean", DoubleType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    fr = avi_mjpeg_frames(bytes(b))
                except ValueError:
                    rows.append((i, None, None, None, None))
                    continue
                for j in range(0, len(fr), every_k):
                    try:
                        w, h, _c, m = jpeg_pixel_stats(fr[j])
                        rows.append((i, j, w, h, m))
                    except ValueError:
                        rows.append((i, j, None, None, None))
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "width", "height", "px_mean"])

    return df.mapInPandas(fn, schema)


def embed_media(df: DataFrame, dim: int = 8, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """(id, embedding array<float>): media → embedding-vector plumbing.
    STUB featurizer: the first ``dim`` md5 digest bytes scaled to [0,1] —
    deterministic, so downstream similarity/dedup stages are testable; a
    real encoder (CLIP etc.) drops into the same batch signature. The
    digest is taken over the uppercase-hex rendering of the payload so an
    ANSI-SQL oracle (md5 is VARCHAR-only in DuckDB) can recompute it."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[payload_col]:
                d = hashlib.md5(bytes(b).hex().upper().encode()).digest()
                vecs.append([d[j % 16] / 255.0 for j in range(dim)])
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.mapInPandas(fn, schema)


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _decode_ima_adpcm(data: bytes, n_ch: int, block_align: int):
    """IMA/DVI ADPCM (WAV format 0x11) → float64 samples in [-1, 1]
    scale of int16. Per spec each channel block starts with a 4-byte
    header (predictor i16, step index u8, reserved), then nibbles in
    4-byte-per-channel interleave; mono suffices for the feature kernel
    (multi-channel raises — honest gate)."""
    import struct

    import numpy as np

    if n_ch != 1:
        raise ValueError("IMA ADPCM: only mono supported")
    if block_align < 4:
        raise ValueError("IMA ADPCM: bad block align")
    out: list[int] = []
    for boff in range(0, len(data) - 3, block_align):
        block = data[boff:boff + block_align]
        pred = struct.unpack_from("<h", block, 0)[0]
        idx = min(block[2], 88)
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = _IMA_STEPS[idx]
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
                idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
                out.append(pred)
    return np.array(out, np.float64)


def decode_wav(b: bytes) -> tuple[int, int, int, float, float]:
    """Pure-stdlib+numpy WAV decode → (n_channels, sample_rate,
    n_samples, duration_s, rms).

    RIFF/WAVE chunk walk (public spec, Microsoft/IBM RIFF): 'fmt '
    carries format tag / channels / rate / bits, 'data' carries PCM
    samples. PCM 8-bit (unsigned), 16/32-bit (signed LE) and 32-bit
    float (format 3) decode for real via one `np.frombuffer`; rms is
    over samples normalized to [-1, 1]. Raises ValueError on non-RIFF,
    non-PCM or truncated payloads (honest gate, matching the image
    kernels)."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    tag, n_ch, rate, _brate, _align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError("WAV with zero channels or rate")
    if tag == 1 and bits == 8:
        x = np.frombuffer(data, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        x = np.frombuffer(data[:len(data) & ~1], "<i2").astype(np.float64)
        x /= 32768.0
    elif tag == 1 and bits == 32:
        x = np.frombuffer(data[:len(data) & ~3], "<i4").astype(np.float64)
        x /= 2147483648.0
    elif tag == 3 and bits == 32:
        x = np.frombuffer(data[:len(data) & ~3], "<f4").astype(np.float64)
    elif tag == 0x11 and bits == 4:
        x = _decode_ima_adpcm(data, n_ch, _align) / 32768.0
    else:
        raise ValueError(f"WAV format tag {tag}/{bits}-bit unsupported")
    n_samples = len(x) // n_ch
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    return int(n_ch), int(rate), int(n_samples), n_samples / rate, rms


def audio_stats(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id", real: bool = False) -> DataFrame:
    """(id, kind, n_channels, sample_rate, n_samples, duration_s, rms):
    audio feature extraction over Arrow-batched mapInPandas — narrow,
    no shuffle, batch-at-a-time like the image kernels.

    ``real=False`` (default): deterministic STUB — every field is a pure
    function of the byte length so the plumbing (schema, batching, the
    DuckDB oracle twin) is testable without codec libraries.
    ``real=True``: RIFF payloads decode for REAL via the pure-stdlib
    `decode_wav` (PCM 8/16/32-bit and float32); non-WAV or malformed
    payloads yield nulls under the same schema."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                kind = sniff_kind(b)
                n = len(b)
                if not real:
                    ch = 1 + n % 2
                    rate = 8000 + (n * 443) % 40000
                    ns = n * 4
                    rows.append((i, kind, ch, rate, ns, ns / rate,
                                 ((n * 977) % 1000) / 1000.0))
                    continue
                try:
                    ch, rate, ns, dur, rms = decode_wav(b)
                    rows.append((i, kind, ch, rate, ns, dur, rms))
                except ValueError:
                    rows.append((i, kind, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                id_col, "kind", "n_channels", "sample_rate", "n_samples",
                "duration_s", "rms"])

    return df.mapInPandas(fn, schema)


# --------------------------------------------------- H.264/H.265 SPS parse

class _EGReader:
    """MSB-first bit reader with exp-Golomb (ue/se) decode for
    NAL RBSP payloads (emulation-prevention bytes already stripped)."""

    def __init__(self, b: bytes):
        self.b = b
        self.p = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.b[self.p >> 3]
            v = (v << 1) | ((byte >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


def _strip_ep(b: bytes) -> bytes:
    """Remove H.264/H.265 emulation-prevention bytes (00 00 03 → 00 00)."""
    return b.replace(b"\x00\x00\x03", b"\x00\x00")


_H264_EXT_PROFILES = (100, 110, 122, 244, 44, 83, 86, 118, 128,
                      138, 139, 134, 135)


def parse_h264_sps(nal: bytes) -> tuple[int, int, int]:
    """H.264 (ITU-T H.264 §7.3.2.1.1) SPS NAL → (profile_idc, width,
    height) in luma samples, frame cropping applied."""
    if not nal or (nal[0] & 0x1F) != 7:
        raise ValueError("not an H.264 SPS NAL")
    r = _EGReader(_strip_ep(nal[1:]))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    r.u(8)  # level_idc
    r.ue()  # seq_parameter_set_id
    chroma = 1
    if profile in _H264_EXT_PROFILES:
        chroma = r.ue()
        if chroma == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(12 if chroma == 3 else 8):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    last, nxt = 8, 8
                    for _ in range(16 if i < 6 else 64):
                        if nxt:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc = r.ue()
    if poc == 0:
        r.ue()
    elif poc == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw = r.ue()
    ph = r.ue()
    fmo = r.u(1)  # frame_mbs_only_flag
    if not fmo:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    cl = cr = ct = cb = 0
    if r.u(1):  # frame_cropping_flag
        cl, cr, ct, cb = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units per §7.4.2.1.1 (chroma 1 → 2/2, 2 → 2/1, 3 or 0 → 1/1)
    cux = 2 if chroma in (1, 2) else 1
    cuy = (2 if chroma == 1 else 1) * (2 - fmo)
    width = (pw + 1) * 16 - cux * (cl + cr)
    height = (2 - fmo) * (ph + 1) * 16 - cuy * (ct + cb)
    return profile, width, height


def _h265_ptl(r: _EGReader, max_sub_layers_minus1: int) -> int:
    """profile_tier_level (H.265 §7.3.3) → general_profile_idc."""
    r.u(2)  # general_profile_space
    r.u(1)  # general_tier_flag
    profile = r.u(5)
    r.u(32)  # general_profile_compatibility_flags
    r.u(48)  # progressive/interlaced/non-packed/frame-only + reserved
    r.u(8)  # general_level_idc
    if max_sub_layers_minus1:
        pres = [(r.u(1), r.u(1)) for _ in range(max_sub_layers_minus1)]
        for _ in range(max_sub_layers_minus1, 8):
            r.u(2)  # reserved_zero_2bits
        for pp, lp in pres:
            if pp:
                r.u(2 + 1 + 5)
                r.u(32)
                r.u(48)
            if lp:
                r.u(8)
    return profile


def parse_h265_sps(nal: bytes) -> tuple[int, int, int]:
    """H.265 (ITU-T H.265 §7.3.2.2.1) SPS NAL → (general_profile_idc,
    pic_width_in_luma_samples, pic_height_in_luma_samples)."""
    if len(nal) < 2 or ((nal[0] >> 1) & 0x3F) != 33:
        raise ValueError("not an H.265 SPS NAL")
    r = _EGReader(_strip_ep(nal[2:]))
    r.u(4)  # sps_video_parameter_set_id
    msl = r.u(3)  # sps_max_sub_layers_minus1
    r.u(1)  # sps_temporal_id_nesting_flag
    profile = _h265_ptl(r, msl)
    r.ue()  # sps_seq_parameter_set_id
    chroma = r.ue()
    if chroma == 3:
        r.u(1)  # separate_colour_plane_flag
    width = r.ue()
    height = r.ue()
    return profile, width, height


_VIDEO_ENTRIES = (b"avc1", b"avc3", b"hvc1", b"hev1")


def _sps_from_stsd(b: bytes, body: int, end: int):
    """Walk an stsd box: VisualSampleEntry dims + the first SPS NAL out
    of an avcC/hvcC decoder-config sub-box → (sps_dims, entry_dims),
    either possibly None."""
    import struct

    if body + 8 > end:
        return None, None
    n_entries = struct.unpack_from(">I", b, body + 4)[0]
    pos = body + 8
    for _ in range(min(n_entries, 32)):
        if pos + 8 > end:
            break
        (esz,) = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4:pos + 8]
        if esz < 8 or pos + esz > end:
            break
        if fourcc in _VIDEO_ENTRIES:
            ebody = pos + 8
            entry_dims = None
            if ebody + 28 <= pos + esz:
                ew, eh = struct.unpack_from(">HH", b, ebody + 24)
                if ew and eh:
                    entry_dims = (ew, eh)
            # sub-boxes start after the 78-byte VisualSampleEntry fields
            sub = ebody + 78
            while sub + 8 <= pos + esz:
                (ssz,) = struct.unpack_from(">I", b, sub)
                styp = b[sub + 4:sub + 8]
                if ssz < 8 or sub + ssz > pos + esz:
                    break
                try:
                    if styp == b"avcC":
                        cfg = b[sub + 8:sub + ssz]
                        nsps = cfg[5] & 0x1F
                        if nsps:
                            ln = struct.unpack_from(">H", cfg, 6)[0]
                            _p, w, h = parse_h264_sps(cfg[8:8 + ln])
                            return (w, h), entry_dims
                    elif styp == b"hvcC":
                        cfg = b[sub + 8:sub + ssz]
                        n_arrays = cfg[22]
                        off = 23
                        for _a in range(n_arrays):
                            ntype = cfg[off] & 0x3F
                            cnt = struct.unpack_from(">H", cfg, off + 1)[0]
                            off += 3
                            for _n in range(cnt):
                                ln = struct.unpack_from(">H", cfg, off)[0]
                                nal = cfg[off + 2:off + 2 + ln]
                                off += 2 + ln
                                if ntype == 33:
                                    _p, w, h = parse_h265_sps(nal)
                                    return (w, h), entry_dims
                except (ValueError, IndexError, struct.error):
                    pass  # malformed config: keep looking / dims-only
                sub += ssz
            return None, entry_dims
        pos += esz
    return None, None


def decode_mp4(b: bytes) -> tuple[float, int | None, int | None, int]:
    """Pure-stdlib ISO BMFF (MP4/MOV) metadata parse → (duration_s,
    width, height, n_tracks).

    Box walk per ISO/IEC 14496-12: u32 size + fourcc (size 1 → u64
    largesize, size 0 → to-end). Recurses into 'moov'/'trak' (and on
    into 'mdia'/'minf'/'stbl' for the sample description); 'mvhd'
    (version 0: u32 timescale/duration at +12, version 1: u64 at +20)
    gives the movie duration; width/height come from the first non-zero
    source in priority order tkhd (16.16 display dims) → SPS parse of
    the avcC/hvcC decoder config (H.264 §7.3.2.1.1 / H.265 §7.3.2.2.1
    coded luma dims, crop applied) → VisualSampleEntry u16 dims;
    n_tracks counts 'trak' boxes. No sample data is touched."""
    import struct

    duration = None
    dims = None
    sps_dims = None
    entry_dims = None
    tracks = 0

    def walk(lo: int, hi: int, depth: int) -> None:
        nonlocal duration, dims, sps_dims, entry_dims, tracks
        pos = lo
        while pos + 8 <= hi:
            (sz,) = struct.unpack_from(">I", b, pos)
            typ = b[pos + 4:pos + 8]
            body = pos + 8
            if sz == 1:
                if pos + 16 > hi:
                    raise ValueError("mp4 largesize truncated")
                (sz,) = struct.unpack_from(">Q", b, pos + 8)
                body = pos + 16
            elif sz == 0:
                sz = hi - pos
            if sz < 8 or pos + sz > hi:
                raise ValueError(f"mp4 box size {sz} out of range")
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl") \
                    and depth < 8:
                if typ == b"trak":
                    tracks += 1
                walk(body, pos + sz, depth + 1)
            elif typ == b"stsd" and sps_dims is None:
                sd, ed = _sps_from_stsd(b, body, pos + sz)
                sps_dims = sps_dims or sd
                entry_dims = entry_dims or ed
            elif typ == b"mvhd" and body + 4 <= hi:
                ver = b[body]
                if ver == 1 and body + 28 <= hi:
                    (ts,) = struct.unpack_from(">I", b, body + 20)
                    (dur,) = struct.unpack_from(">Q", b, body + 24)
                else:
                    ts, dur = struct.unpack_from(">II", b, body + 12)
                if ts:
                    duration = dur / ts
            elif typ == b"tkhd" and dims is None:
                # ISO 14496-12 §8.3.2: verflags(4) + times/track-id/
                # reserved/duration (20 for v0, 32 for v1) + reserved(8)
                # + layer/alt_group/volume/reserved(8) + matrix(36) →
                # width/height 16.16 at body+76 (v0) / body+88 (v1),
                # bounded by this tkhd box's end, not the parent's.
                ver = b[body]
                tail = body + (88 if ver == 1 else 76)
                if tail + 8 <= pos + sz:
                    wfx, hfx = struct.unpack_from(">II", b, tail)
                    if wfx and hfx:
                        dims = (wfx >> 16, hfx >> 16)
            pos += sz

    if sniff_kind(b) != "mp4":
        raise ValueError("not an ISO BMFF payload (no ftyp)")
    walk(0, len(b), 0)
    if duration is None:
        raise ValueError("mp4 without mvhd")
    w, h = dims or sps_dims or entry_dims or (None, None)
    return float(duration), w, h, tracks


# synthesis helpers (tests + oracle payloads): minimal SPS bit writers
# and an H.264/H.265-in-MP4 container builder whose planted dims the
# real parse must recover

class _EGWriter:
    def __init__(self):
        self.bits: list = []

    def u(self, v: int, n: int) -> "_EGWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "_EGWriter":
        k = v + 1
        n = k.bit_length() - 1
        self.u(0, n)
        self.u(k, n + 1)
        return self

    def bytes(self) -> bytes:
        bits = self.bits + [1] + [0] * 7  # rbsp_stop_one_bit + pad
        out = bytearray()
        for i in range(0, len(self.bits) + 1, 8):
            v = 0
            for j in range(8):
                v = (v << 1) | (bits[i + j] if i + j < len(bits) else 0)
            out.append(v)
        return bytes(out)


def write_h264_sps(width: int, height: int, profile: int = 66) -> bytes:
    """Baseline-profile SPS NAL for 16-multiple dims (no cropping)."""
    if width % 16 or height % 16:
        raise ValueError("write_h264_sps needs multiples of 16")
    w = _EGWriter()
    w.u(profile, 8).u(0, 8).u(30, 8)          # profile/constraints/level
    w.ue(0)                                    # sps id
    if profile in _H264_EXT_PROFILES:          # high-profile extension
        w.ue(1)                                # chroma_format_idc 4:2:0
        w.ue(0).ue(0)                          # bit depths
        w.u(0, 1)                              # qpprime bypass
        w.u(0, 1)                              # no scaling matrix
    w.ue(0)                                    # log2_max_frame_num_minus4
    w.ue(2)                                    # pic_order_cnt_type = 2
    w.ue(1)                                    # max_num_ref_frames
    w.u(0, 1)                                  # gaps_in_frame_num
    w.ue(width // 16 - 1)
    w.ue(height // 16 - 1)
    w.u(1, 1)                                  # frame_mbs_only
    w.u(1, 1)                                  # direct_8x8_inference
    w.u(0, 1)                                  # frame_cropping
    w.u(0, 1)                                  # vui_parameters_present
    return b"\x67" + w.bytes()


def write_h265_sps(width: int, height: int, profile: int = 1) -> bytes:
    w = _EGWriter()
    w.u(0, 4).u(0, 3).u(1, 1)                  # vps id, sub layers, nesting
    w.u(0, 2).u(0, 1).u(profile, 5)            # PTL: space/tier/profile
    w.u(0, 32).u(0, 48).u(93, 8)               # compat/flags/level
    w.ue(0)                                    # sps id
    w.ue(1)                                    # chroma_format_idc 4:2:0
    w.ue(width)
    w.ue(height)
    w.ue(0)                                    # conformance window absent…
    # (stop bit from bytes() terminates the payload; the parser never
    # reads past pic_height)
    return b"\x42\x01" + w.bytes()


def write_video_mp4(width: int, height: int, codec: str = "h264",
                    duration_s: float = 2.0, profile: int | None = None) -> bytes:
    """Minimal ftyp+moov MP4 whose tkhd dims are ZERO so video_meta
    (real=True) must recover width/height from the avcC/hvcC SPS."""
    import struct

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + t + payload

    if codec == "h264":
        sps = write_h264_sps(width, height, profile or 66)
        cfg = (bytes([1, profile or 66, 0, 30, 0xFF, 0xE1])
               + struct.pack(">H", len(sps)) + sps + b"\x00")
        entry_fmt, cfg_box = b"avc1", box(b"avcC", cfg)
    elif codec == "h265":
        sps = write_h265_sps(width, height, profile or 1)
        cfg = (bytes([1, (profile or 1) & 0x1F]) + bytes(4) + bytes(6)
               + bytes([93]) + b"\xF0\x00" + b"\xFC" + b"\xFD"
               + b"\xF8" + b"\xF8" + bytes(2) + bytes([0x03]) + bytes([1])
               + bytes([33])                     # array: NAL type 33 (SPS)
               + struct.pack(">H", 1) + struct.pack(">H", len(sps)) + sps)
        entry_fmt, cfg_box = b"hvc1", box(b"hvcC", cfg)
    else:
        raise ValueError(codec)
    # VisualSampleEntry: 78 fixed bytes; u16 dims at +24 also zeroed so
    # the SPS is the only dimension source
    entry = (bytes(6) + struct.pack(">H", 1) + bytes(16)
             + struct.pack(">HH", 0, 0) + bytes(4 + 4 + 4 + 2)
             + bytes(32) + struct.pack(">Hh", 24, -1) + cfg_box)
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1)
               + box(entry_fmt, entry))
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    tkhd = box(b"tkhd", b"\x00" + bytes(3) + bytes(20 + 8 + 8 + 36)
               + struct.pack(">II", 0, 0))
    trak = box(b"trak", tkhd + mdia)
    ts = 600
    mvhd = box(b"mvhd", b"\x00" + bytes(3) + bytes(8)
               + struct.pack(">II", ts, int(duration_s * ts)) + bytes(80))
    return (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
            + box(b"moov", mvhd + trak))


def video_meta(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id", real: bool = False) -> DataFrame:
    """(id, kind, duration_s, width, height, n_tracks): container-level
    video metadata over Arrow-batched mapInPandas.

    ``real=False`` (default): deterministic STUB (pure function of byte
    length) so the plumbing and DuckDB oracle are testable.
    ``real=True``: mp4/mov payloads parse for REAL via the pure-stdlib
    `decode_mp4` box walk (movie duration, track dims, track count) —
    frame pixel extraction still needs a real codec and stays with
    `frame_sample`; malformed payloads yield nulls, same schema."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_tracks", LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                kind = sniff_kind(b)
                n = len(b)
                if not real:
                    w = 160 + (n * 31) % 1760
                    h = 90 + (n * 17) % 990
                    rows.append((i, kind, (n % 3600) / 10.0, w, h,
                                 1 + n % 3))
                    continue
                try:
                    dur, w, h, nt = decode_mp4(b)
                    rows.append((i, kind, dur, w, h, nt))
                except ValueError:
                    rows.append((i, kind, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                id_col, "kind", "duration_s", "width", "height",
                "n_tracks"])

    return df.mapInPandas(fn, schema)
