"""Minimal baseline JPEG *encoder* for decoder tests (T.81 §F/Annex C).

Produces standard-conformant SOF0 streams: flat quantization, canonical
Huffman tables declared via DHT, any (H,V) chroma sampling, optional
restart markers. Ground truth for tests is the original pixel array —
decode(encode(px)) must reproduce it within the quantization error — so
the decoder's bitstream framing, zigzag, dequant and IDCT are checked
against an independently computed forward transform, not a mirror of
the decoder's own code paths.
"""

from __future__ import annotations

import struct

import numpy as np

from oxbow_spark.operators.jpeg import ZIGZAG, _T8

# canonical tables: DC sizes 0..11 all at code length 4; every AC
# (run, size<=10) symbol at code length 9. Prefix-free by construction.
DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = bytes(range(12))
AC_SYMBOLS = bytes((r << 4) | s for r in range(16) for s in range(11))
AC_COUNTS = [0] * 16
AC_COUNTS[8] = len(AC_SYMBOLS)  # all at length 9


def _codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _codes(DC_COUNTS, DC_SYMBOLS)
AC_CODES = _codes(AC_COUNTS, AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _mag(v: int) -> tuple[int, int]:
    """(size, bits) per §F.1.2.1: size = bitlength, negative values are
    stored as v + 2^size - 1."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), \
        px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def encode_jpeg(px: np.ndarray, quant: int = 1, sampling=None,
                restart_interval: int = 0) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JPEG. ``sampling`` is [(H, V), ...] per component (defaults
    to 4:4:4 / single-component); ``quant`` fills a flat quant table."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        sampling = sampling or [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(px)
        planes = [ycc[..., i] for i in range(3)]
        sampling = sampling or [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component downsampled, edge-padded planes of block-grid size
    comp_planes = []
    for (hi, vi), plane in zip(sampling, planes):
        if (hmax // hi, vmax // vi) != (1, 1):
            fy, fx = vmax // vi, hmax // hi
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(plane, ((0, th - plane.shape[0]),
                               (0, tw - plane.shape[1])), mode="edge")
        comp_planes.append(plane)

    q = np.full(64, float(quant))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in q))  # table 0, zigzag
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (hi, vi) in enumerate(sampling):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(planes)
            for ci, (hi, vi) in enumerate(sampling):
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        blk = comp_planes[ci][r0:r0 + 8, c0:c0 + 8] - 128.0
                        coef = _T8 @ blk @ _T8.T
                        zz = np.round(coef.reshape(-1)[ZIGZAG] / q).astype(int)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, bits = _mag(diff)
                        ln, code = DC_CODES[t]
                        bw.put(code, ln)
                        if t:
                            bw.put(bits, t)
                        run = 0
                        last_nz = max(np.nonzero(zz[1:])[0]) + 1 \
                            if np.any(zz[1:]) else 0
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = AC_CODES[0xF0]
                                bw.put(code, ln)
                                run -= 16
                            s, bits = _mag(v)
                            ln, code = AC_CODES[(run << 4) | s]
                            bw.put(code, ln)
                            bw.put(bits, s)
                            run = 0
                        if last_nz < 63:
                            ln, code = AC_CODES[0x00]
                            bw.put(code, ln)
            mcu_count += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
