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


# ---------------------------------------------------------- progressive

def _nbits(v: int) -> int:
    return int(v).bit_length()


class _ProgWriter(_BitWriter):
    """Bit writer with EOB-run + buffered-correction-bit bookkeeping
    (the §G.1.2.2/libjpeg scheme). TWO correction-bit segments, exactly
    like libjpeg's BE/BR split: ``corr_run`` holds bits belonging to the
    pending EOB run (flushed right after the EOBn symbol), ``corr``
    holds the current block's bits since the last emitted symbol
    (flushed right after that symbol + sign). A block that joins the
    EOB run migrates its bits into the run segment."""

    def __init__(self, codes):
        super().__init__()
        self.codes = codes
        self.eobrun = 0
        self.corr_run: list[int] = []
        self.corr: list[int] = []

    def sym(self, s: int) -> None:
        ln, code = self.codes[s]
        self.put(code, ln)

    def flush_corr(self) -> None:
        for bit in self.corr:
            self.put(bit, 1)
        self.corr = []

    def join_eobrun(self) -> None:
        self.eobrun += 1
        self.corr_run.extend(self.corr)
        self.corr = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nb = _nbits(self.eobrun) - 1
            self.sym(nb << 4)
            if nb:
                self.put(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
            for bit in self.corr_run:
                self.put(bit, 1)
            self.corr_run = []


def _prog_blocks(comp_plane, sw, sh, bw):
    """Quantized zigzag blocks of one component, padded grid."""
    import numpy as np
    out = {}
    for sy in range(sh):
        for sx in range(sw):
            blk = comp_plane[sy * 8:sy * 8 + 8, sx * 8:sx * 8 + 8] - 128.0
            coef = _T8 @ blk @ _T8.T
            out[sy * bw + sx] = np.round(coef.reshape(-1)[ZIGZAG]).astype(int)
    return out


def encode_jpeg_progressive(px, sampling=None) -> bytes:
    """Progressive (SOF2) encoder with a libjpeg-like scan script:
    DC first (Al=1) → per-component AC bands (Al=1) → DC refine →
    per-component AC refine (Ah=1→Al=0). Flat quant=1. Exercises the
    decoder's DC first/refine, AC first (EOBRUN/ZRL) and AC refine
    (corrections, insertions, EOB-correction) paths."""
    import struct

    import numpy as np

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

    comps = []
    for (hi, vi), plane in zip(sampling, planes):
        if (hmax // hi, vmax // vi) != (1, 1):
            fy, fx = vmax // vi, hmax // hi
            ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
            pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comp_w, comp_h = -(-w * hi // hmax), -(-h * vi // vmax)
        sw, sh = -(-comp_w // 8), -(-comp_h // 8)
        bw, bh = mcux * hi, mcuy * vi
        tpl = np.pad(plane, ((0, bh * 8 - plane.shape[0]),
                             (0, bw * 8 - plane.shape[1])), mode="edge")
        # interleaved DC walks visit the FULL padded (bw x bh) grid
        comps.append({"hi": hi, "vi": vi, "sw": sw, "sh": sh,
                      "bw": bw, "bh": bh,
                      "blocks": _prog_blocks(tpl, bw, bh, bw)})

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, c in enumerate(comps):
        sof += bytes([ci + 1, (c["hi"] << 4) | c["vi"], 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMBOLS)

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, sos)

    # --- scan 1: interleaved DC first, Al=1
    al = 1
    out += sos_header(list(range(len(comps))), 0, 0, 0, al)
    bw_ = _ProgWriter(AC_CODES)
    dc_codes = DC_CODES
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["vi"]):
                    for bx in range(c["hi"]):
                        row = (my * c["vi"] + by) * c["bw"] + (mx * c["hi"] + bx)
                        v = int(c["blocks"][row][0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t, bits = _mag(diff)
                        ln, code = dc_codes[t]
                        bw_.put(code, ln)
                        if t:
                            bw_.put(bits, t)
    bw_.align()
    out += bw_.out

    # --- per-component AC first scans (two bands for comp 0), Al=1
    ac_al = 1

    def ac_first_scan(ci, ss, se):
        nonlocal out
        out += sos_header([ci], ss, se, 0, ac_al)
        c = comps[ci]
        pw = _ProgWriter(AC_CODES)
        for sy in range(c["sh"]):
            for sx in range(c["sw"]):
                zz = c["blocks"][sy * c["bw"] + sx]
                run = 0
                emitted = False
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    m = abs(v) >> ac_al
                    if m == 0:
                        run += 1
                        continue
                    pw.flush_eobrun()
                    while run > 15:
                        pw.sym(0xF0)
                        run -= 16
                    s, bits = _mag(m if v > 0 else -m)
                    pw.sym((run << 4) | s)
                    pw.put(bits, s)
                    run = 0
                    emitted = True
                if run > 0 or not emitted:
                    pw.eobrun += 1
                    if pw.eobrun == 0x7FFF:
                        pw.flush_eobrun()
        pw.flush_eobrun()
        pw.align()
        out += pw.out

    ac_first_scan(0, 1, 5)
    ac_first_scan(0, 6, 63)
    for ci in range(1, len(comps)):
        ac_first_scan(ci, 1, 63)

    # --- DC refine scan (interleaved), Ah=1 -> Al=0
    out += sos_header(list(range(len(comps))), 0, 0, 1, 0)
    bw_ = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["vi"]):
                    for bx in range(c["hi"]):
                        row = (my * c["vi"] + by) * c["bw"] + (mx * c["hi"] + bx)
                        bw_.put(int(c["blocks"][row][0]) & 1, 1)
    bw_.align()
    out += bw_.out

    # --- per-component AC refine scans, Ah=1 -> Al=0
    def ac_refine_scan(ci, ss, se):
        nonlocal out
        ah, al2 = 1, 0
        out += sos_header([ci], ss, se, ah, al2)
        c = comps[ci]
        pw = _ProgWriter(AC_CODES)
        for sy in range(c["sh"]):
            for sx in range(c["sw"]):
                zz = c["blocks"][sy * c["bw"] + sx]
                temps = [abs(int(zz[k])) >> al2 for k in range(ss, se + 1)]
                eob = 0  # band-relative index AFTER last newly-significant
                for i, t in enumerate(temps):
                    if t == 1:
                        eob = i + 1
                run = 0
                for i, t in enumerate(temps):
                    if t == 0:
                        run += 1
                        continue
                    # any nonzero: emit due ZRLs first (but never past the
                    # last new coefficient — those zeros fold into the EOB)
                    while run > 15 and i < eob:
                        pw.flush_eobrun()
                        pw.sym(0xF0)
                        run -= 16
                        pw.flush_corr()
                    if t > 1:  # already significant: buffered correction
                        pw.corr.append(t & 1)
                        continue
                    # newly significant (t == 1)
                    pw.flush_eobrun()
                    pw.sym((run << 4) | 1)
                    pw.put(1 if int(zz[ss + i]) > 0 else 0, 1)
                    pw.flush_corr()
                    run = 0
                if eob < len(temps):
                    # symbols did not reach the band end: the block joins
                    # an EOB run (even with no corrections pending — the
                    # decoder must be told to skip it); its tail
                    # corrections migrate into the run segment
                    pw.join_eobrun()
                    if pw.eobrun == 0x7FFF:
                        pw.flush_eobrun()
        pw.flush_eobrun()
        pw.align()
        out += pw.out

    for ci in range(len(comps)):
        ac_refine_scan(ci, 1, 63)

    out += b"\xff\xd9"
    return bytes(out)
