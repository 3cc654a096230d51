"""CRAM writer: ``df.write.format("cram")`` — completing the writer
matrix for every readable format.

Beyond the reference (no writers). Emits CRAM 3.0 (default) or 3.1
(``version='3.1'``). Default profile is **reference-less** (preservation
map ``RR=0``, absolute positions ``AP=0``): sequences are stored
verbatim — match stretches as ``b`` features, insertions/soft-clips/
deletions/skips/hard-clips/pads as their native feature codes — so no
FASTA is needed to write OR to read the output (the same no-ref mode
htslib's ``no_ref`` option uses). With ``reference=<fasta path>`` (.fai
required) the writer switches to the **reference-based profile**
(``RR=1`` + canonical substitution matrix — the real-producer default):
matching stretches emit NO bases at all (the decoder fills them from
the same FASTA), point mismatches code as 2-bit ``X`` substitutions,
and anything uncodable (non-ACGTN, soft-masked-lowercase reference
windows — comparison is byte-exact) falls back to verbatim ``b`` runs,
so round-trips are exact byte-for-byte. Reading such files requires
``.option('reference', ...)``, the standard CRAM contract. Data series are EXTERNAL-coded per series —
gzip by default; ``codec='rans'`` switches to real-producer per-block
method selection over raw/gzip/rANS-4x8 order 0/order 1 (+ rANS Nx16
under 3.1), every encoder the exact inverse of this repo's spec
decoders. One slice per part-file container, multiref slices (``RI``
per record), detached mate info (``MF/NS/NP/TS``) for every record.

Validated by exact round-trips through this repo's CRAM decoder (which
itself is validated record-for-record against htslib-produced fixtures).

Documented corners:
- ``=``/``X`` CIGAR ops normalize to ``M`` on re-read (the no-ref
  profile stores bases, not match/mismatch classification);
- tags are not written (project the ``tags`` column away or keep it —
  it is ignored);
- a mapped record with ``*`` sequence but no CIGAR cannot carry
  qualities (no read length on the wire) — they are dropped.
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator

from oxbow_spark.models.sam_header import SamHeader
from oxbow_spark.sources.align_write import _AlignmentWriter, _PartFile

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
                  (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    """LTF8 (int64 varint): n leading 1-bits in the first byte signal n
    continuation bytes; 7−n value bits ride in the first byte. Unlike
    ITF8 there is no 4-bit tail quirk, so the encodings diverge at
    2^28 — a part file's base counter can exceed that, hence the real
    encoder (round-trip property-tested against the reader)."""
    if v < 0:
        v += 1 << 64
    for n in range(9):
        if n < 8 and v < (1 << (7 * (n + 1))):
            prefix = (0xFF << (8 - n)) & 0xFF
            first = prefix | (v >> (8 * n))
            return bytes([first] + [(v >> (8 * i)) & 0xFF
                                    for i in range(n - 1, -1, -1)])
    return bytes([0xFF] + [(v >> (8 * i)) & 0xFF for i in range(7, -1, -1)])


def _arr(vals) -> bytes:
    return itf8(len(vals)) + b"".join(itf8(v) for v in vals)


# ------------------------------------------------------------- rANS 4x8 write

def _rans_norm_hist(hist) -> list[int]:
    """Normalize a 256-bin histogram to sum EXACTLY 4096 (the 12-bit
    rANS scale), every present symbol ≥ 1 (floor + clamp, drift repaid
    by the largest buckets — the htscodecs normalization strategy)."""
    import numpy as np

    hist = np.asarray(hist, dtype=np.int64)
    total = int(hist.sum())
    f = hist * 4096 // total
    f[(hist > 0) & (f == 0)] = 1
    diff = 4096 - int(f.sum())
    while diff != 0:
        if diff > 0:
            j = int(np.argmax(f))
            f[j] += diff
            diff = 0
        else:
            j = int(np.argmax(np.where(f > 1, f, -1)))
            take = min(-diff, int(f[j]) - 1)
            f[j] -= take
            diff += take
    return [int(x) for x in f]


def _rans_norm_freqs(data: bytes) -> list[int]:
    import numpy as np

    return _rans_norm_hist(
        np.bincount(np.frombuffer(data, np.uint8), minlength=256))


def _rans_write_freqs0(f: list[int]) -> bytes:
    """Order-0 frequency table serializer — exact inverse of the
    reader's `_rans_read_freqs0` (sources/cram.py:264): ascending
    symbols, a run-length byte after a symbol that directly follows the
    previous one, 1- or 2-byte frequencies (top bit selects)."""
    out = bytearray()
    rle = 0
    for j in range(256):
        if not f[j]:
            continue
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j > 0 and f[j - 1] > 0:
                r = j + 1
                while r < 256 and f[r]:
                    r += 1
                rle = r - (j + 1)
                out.append(rle)
        v = f[j]
        if v < 128:
            out.append(v)
        else:
            out.append(0x80 | (v >> 8))
            out.append(v & 0xFF)
    out.append(0)
    return bytes(out)


def rans4x8_encode(data: bytes) -> bytes:
    """rANS 4x8 order-0 encoder (CRAM 3.0 spec §13, block method 4) —
    the standard 4-way interleaved byte-wise rANS: symbols consumed in
    REVERSE, state j = i & 3, renorm emits low bytes which reverse into
    the decoder's forward stream, final states flushed as 4 LE u32 ahead
    of it. Inverse of `sources/cram.py:rans4x8_decode`; round-trip
    property-tested across distributions. Real producers (htslib)
    default external data series to exactly this codec — gzip-only CRAM
    is valid but ~1.3–2× larger."""
    n = len(data)
    if n == 0:
        raise ValueError("rans4x8_encode: empty input (write a RAW block)")
    f = _rans_norm_freqs(data)
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + f[s]
    L = 1 << 23
    R = [L, L, L, L]
    emitted = bytearray()
    for i in range(n - 1, -1, -1):
        s = data[i]
        j = i & 3
        x = R[j]
        fs = f[s]
        x_max = fs << 19          # ((L >> 12) << 8) * freq
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        R[j] = ((x // fs) << 12) + (x % fs) + cum[s]
    body = (_rans_write_freqs0(f)
            + struct.pack("<4I", R[0], R[1], R[2], R[3])
            + bytes(reversed(emitted)))
    return bytes([0]) + struct.pack("<I", len(body)) \
        + struct.pack("<I", n) + body


def rans4x8_encode_o1(data: bytes) -> bytes:
    """rANS 4x8 ORDER-1 encoder (context = previous byte; CRAM 3.0
    spec §13) — the codec real producers pick for context-correlated
    series (qualities, bases). Counting and the encode walk mirror the
    reader exactly: each quarter's first symbol takes context 0, the
    4q..n tail rides state 3 with its running context, and the reverse
    walk emits the tail first, then steps q−1→0 with states 3→0, so the
    reversed byte stream is the decoder's forward order. Inverse of
    `sources/cram.py:rans4x8_decode` (order 1)."""
    import numpy as np

    n = len(data)
    if n < 4:
        raise ValueError("order-1 needs ≥4 bytes (use order 0)")
    q = n >> 2
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    FM = np.zeros((256, 256), dtype=np.int64)
    np.add.at(FM, (arr[:-1], arr[1:]), 1)
    FM[0, arr[0]] += 1
    for st in (q, 2 * q, 3 * q):
        if st > 0:
            FM[arr[st - 1], arr[st]] -= 1
            FM[0, arr[st]] += 1
    tables: dict[int, tuple[list[int], list[int]]] = {}
    for c in range(256):
        if FM[c].sum() > 0:
            f = _rans_norm_hist(FM[c])
            cum = [0] * 257
            for s in range(256):
                cum[s + 1] = cum[s] + f[s]
            tables[c] = (f, cum)

    # context-table serialization: same RLE-over-ascending scheme as
    # the symbol tables, each context followed by its full freq table
    present = [0] * 256
    for c in tables:
        present[c] = 1
    hdr = bytearray()
    rle = 0
    for c in range(256):
        if not present[c]:
            continue
        if rle:
            rle -= 1
        else:
            hdr.append(c)
            if c > 0 and present[c - 1]:
                r = c + 1
                while r < 256 and present[r]:
                    r += 1
                rle = r - (c + 1)
                hdr.append(rle)
        hdr += _rans_write_freqs0(tables[c][0])
    hdr.append(0)

    L = 1 << 23
    R = [L, L, L, L]
    emitted = bytearray()

    def enc(j: int, i: int, ctx: int) -> None:
        s = data[i]
        f, cum = tables[ctx]
        fs = f[s]
        x = R[j]
        x_max = fs << 19
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        R[j] = ((x // fs) << 12) + (x % fs) + cum[s]

    for i in range(n - 1, 4 * q - 1, -1):        # state-3 tail, reversed
        enc(3, i, 0 if i == 0 else data[i - 1])
    for k in range(q - 1, -1, -1):
        for j in (3, 2, 1, 0):
            i = j * q + k
            enc(j, i, 0 if k == 0 else data[i - 1])
    body = (bytes(hdr)
            + struct.pack("<4I", R[0], R[1], R[2], R[3])
            + bytes(reversed(emitted)))
    return bytes([1]) + struct.pack("<I", len(body)) \
        + struct.pack("<I", n) + body


def _uint7_enc(v: int) -> bytes:
    """CRAM 3.1 uint7 varint (MSB-first, top bit = continuation) —
    inverse of `sources/cram.py:_uint7`."""
    chunks = [v & 0x7F]
    v >>= 7
    while v:
        chunks.append(v & 0x7F)
        v >>= 7
    chunks.reverse()
    return bytes([c | 0x80 for c in chunks[:-1]] + [chunks[-1]])


def _nx16_write_alphabet(present: list[int]) -> bytes:
    """Nx16 alphabet serializer (ascending symbols, run-length byte
    after a symbol that follows its predecessor) — inverse of
    `sources/cram.py:_nx16_read_alphabet`; frequencies are written
    separately as uint7s in alphabet order."""
    pres = [0] * 256
    for s in present:
        pres[s] = 1
    out = bytearray()
    rle = 0
    for j in range(256):
        if not pres[j]:
            continue
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j > 0 and pres[j - 1]:
                r = j + 1
                while r < 256 and pres[r]:
                    r += 1
                rle = r - (j + 1)
                out.append(rle)
    out.append(0)
    return bytes(out)


def rans_nx16_encode(data: bytes) -> bytes:
    """rANS Nx16 ORDER-0 encoder (CRAM 3.1 spec §3, block method 5):
    flags 0x00 (order 0, N=4 states, explicit size), 12-bit
    frequencies normalized to 4096 written as uint7s, 16-bit
    renormalization (single-shot per step — provable with 12-bit freqs
    and L=2^15, matching the decoder's single conditional). Inverse of
    `sources/cram.py:rans_nx16_decode`'s order-0 leg; the 3.1 write
    path's entropy candidate."""
    n = len(data)
    if n == 0:
        raise ValueError("rans_nx16_encode: empty input (write RAW)")
    f = _rans_norm_freqs(data)
    present = [s for s in range(256) if f[s]]
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + f[s]
    L = 1 << 15
    R = [L, L, L, L]
    words: list[int] = []
    for i in range(n - 1, -1, -1):
        s = data[i]
        j = i & 3
        x = R[j]
        fs = f[s]
        if x >= (fs << 19):        # ((L >> 12) << 16) * freq
            words.append(x & 0xFFFF)
            x >>= 16
        R[j] = ((x // fs) << 12) + (x % fs) + cum[s]
    body = (_nx16_write_alphabet(present)
            + b"".join(_uint7_enc(f[s]) for s in present)
            + struct.pack("<4I", R[0], R[1], R[2], R[3])
            + b"".join(struct.pack("<H", w) for w in reversed(words)))
    return bytes([0]) + _uint7_enc(n) + body


def rans_nx16_encode_o1(data: bytes) -> bytes:
    """rANS Nx16 ORDER-1 encoder (CRAM 3.1 spec §3, flags 0x01): the
    codec real 3.1 producers pick for context-correlated quality
    series. Per-context 12-bit frequency rows over one shared alphabet
    (each nonzero row normalized to exactly 4096 so the decoder uses
    the stored values verbatim), tables stored UNCOMPRESSED (comp low
    bit 0, shift 12 in the high nibble), 4 states with 16-bit
    single-shot renormalization. The output splits into 4 consecutive
    fragments (position j*q starts fragment j with context 0, matching
    the decoder's fragment walk); the reverse encode walk emits the
    state-3 remainder first, then steps k=q−1→0 with states 3→0, so
    the reversed word stream is the decoder's forward order. Exact
    inverse of `sources/cram.py:_nx16_entropy1` (4-state leg)."""
    import numpy as np

    n = len(data)
    if n < 4:
        raise ValueError("Nx16 order-1 needs >= 4 bytes (use order 0)")
    q = n >> 2
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    FM = np.zeros((256, 256), dtype=np.int64)
    np.add.at(FM, (arr[:-1], arr[1:]), 1)
    FM[0, arr[0]] += 1
    for st in (q, 2 * q, 3 * q):
        FM[arr[st - 1], arr[st]] -= 1
        FM[0, arr[st]] += 1
    # shared row/column alphabet: every data symbol, plus 0 (the
    # fragment-start context row lives at 0 even when 0 never occurs
    # as a data byte)
    syms = sorted(set(np.unique(arr).tolist()) | {0})
    tables: dict[int, tuple[list[int], list[int]]] = {}
    freq_bytes = bytearray()
    for i in syms:
        if FM[i].sum() > 0:
            f = _rans_norm_hist(FM[i])
            cum = [0] * 257
            for s in range(256):
                cum[s + 1] = cum[s] + f[s]
            tables[i] = (f, cum)
            for j in syms:
                freq_bytes += _uint7_enc(f[j])
        else:
            freq_bytes += b"\x00" * len(syms)  # unobserved context row

    L = 1 << 15
    R = [L, L, L, L]
    words: list[int] = []

    def enc(j: int, i: int, ctx: int) -> None:
        s = data[i]
        f, cum = tables[ctx]
        fs = f[s]
        x = R[j]
        if x >= (fs << 19):  # single-shot: 12-bit freqs, 16-bit renorm
            words.append(x & 0xFFFF)
            x >>= 16
        R[j] = ((x // fs) << 12) + (x % fs) + cum[s]

    for i in range(n - 1, 4 * q - 1, -1):     # state-3 remainder, reversed
        enc(3, i, data[i - 1])
    for k in range(q - 1, -1, -1):
        for j in (3, 2, 1, 0):
            i = j * q + k
            enc(j, i, 0 if k == 0 else data[i - 1])
    # table serialization: raw, or order-0-rANS compressed (comp low
    # bit set; the decoder feeds the bytes straight to its entropy0
    # stage) — whichever is smaller. A wide alphabet's table is
    # |syms|^2 uint7s (65 KB at 256 symbols); compression collapses
    # its zero runs, which is what real producers ship
    tbl = _nx16_write_alphabet(syms) + bytes(freq_bytes)
    ctbl = _nx16_strip_head(rans_nx16_encode(tbl))
    comp_hdr = (bytes([(12 << 4) | 1]) + _uint7_enc(len(tbl))
                + _uint7_enc(len(ctbl)) + ctbl)
    raw_hdr = bytes([12 << 4]) + tbl
    body = (min(comp_hdr, raw_hdr, key=len)
            + struct.pack("<4I", R[0], R[1], R[2], R[3])
            + b"".join(struct.pack("<H", w) for w in reversed(words)))
    return bytes([1]) + _uint7_enc(n) + body


def rans_nx16_encode_pack(data: bytes, order: int = 0) -> bytes:
    """rANS Nx16 with the PACK pre-transform (flags 0x80 | order): map
    ≤16 distinct symbols to 1/2/4-bit codes packed LSB-first, then
    entropy-code the packed bytes with the order-0 or order-1 stage —
    the shape htscodecs picks for quality strings drawn from a small
    alphabet. Exact inverse of the decoder's PACK path
    (`sources/cram.py:rans_nx16_decode` flags 0x80 →
    `_nx16_unpack`)."""
    import numpy as np

    n = len(data)
    if n == 0:
        raise ValueError("rans_nx16_encode_pack: empty input (write RAW)")
    arr = np.frombuffer(data, np.uint8)
    syms = np.unique(arr).tolist()
    nsym = len(syms)
    if not 2 <= nsym <= 16:
        raise ValueError("PACK needs 2-16 distinct symbols")
    if nsym <= 2:
        bits = 1
    elif nsym <= 4:
        bits = 2
    else:
        bits = 4
    per = 8 // bits
    code = np.zeros(256, dtype=np.uint8)
    for k, s in enumerate(syms):
        code[s] = k
    codes = code[arr]
    pad = (-n) % per
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    packed = np.zeros(len(codes) // per, dtype=np.uint8)
    for t in range(per):  # LSB-first within each packed byte
        packed |= codes[t::per] << (bits * t)
    pk = packed.tobytes()
    if order and len(pk) >= 4:
        ent = rans_nx16_encode_o1(pk)
    else:
        ent = rans_nx16_encode(pk)
        order = 0
    # inner stream sans its own flags+size: reuse its body directly
    inner = _nx16_strip_head(ent)
    return (bytes([0x80 | order]) + _uint7_enc(n)
            + bytes([nsym]) + bytes(syms) + _uint7_enc(len(pk)) + inner)


def rans_nx16_encode_rle(data: bytes, order: int = 0) -> bytes:
    """rANS Nx16 with the RLE pre-transform (flags 0x40 | order): runs
    of qualifying symbols collapse to one occurrence in the data stream
    plus an extra-repeat uint7 in the metadata stream — the htscodecs
    shape for run-heavy (binned/RTA3) quality series. A symbol
    qualifies when collapsing saves more than its per-run varint costs
    (avg run length > 2). The metadata blob (count byte + symbol list +
    run-length varints) is stored raw or order-0-rANS compressed,
    whichever is smaller; the run-removed stream is entropy-coded with
    order 0 or 1. Exact inverse of the decoder's RLE path
    (`sources/cram.py:_nx16_read_rle_meta` / `_nx16_rle_expand`)."""
    n = len(data)
    if n == 0:
        raise ValueError("rans_nx16_encode_rle: empty input (write RAW)")
    # run-length scan: per symbol, total occurrences and run count
    runs: list[tuple[int, int]] = []  # (symbol, run_length)
    i = 0
    while i < n:
        j = i
        while j < n and data[j] == data[i]:
            j += 1
        runs.append((data[i], j - i))
        i = j
    total = [0] * 256
    n_runs = [0] * 256
    for s, ln in runs:
        total[s] += ln
        n_runs[s] += 1
    rle_syms = [s for s in range(256)
                if n_runs[s] and total[s] > 2 * n_runs[s]]
    if not rle_syms:
        raise ValueError("rans_nx16_encode_rle: no symbol qualifies "
                         "(use order 0/1 without RLE)")
    in_rle = bytearray(256)
    for s in rle_syms:
        in_rle[s] = 1
    stream = bytearray()
    lens = bytearray()
    for s, ln in runs:
        if in_rle[s]:
            stream.append(s)
            lens += _uint7_enc(ln - 1)
        else:
            stream += bytes([s]) * ln
    meta = bytes([len(rle_syms) & 0xFF]) + bytes(rle_syms) + bytes(lens)
    rle_len = _uint7_enc(len(stream))  # entropy-stage output length
    raw_meta = _uint7_enc((len(meta) << 1) | 1) + rle_len + meta
    cmeta = _nx16_strip_head(rans_nx16_encode(meta))
    comp_meta = (_uint7_enc(len(meta) << 1) + rle_len
                 + _uint7_enc(len(cmeta)) + cmeta)
    meta_out = min(raw_meta, comp_meta, key=len)
    if order and len(stream) >= 4:
        ent = rans_nx16_encode_o1(bytes(stream))
    else:
        ent = rans_nx16_encode(bytes(stream))
        order = 0
    return (bytes([0x40 | order]) + _uint7_enc(n) + meta_out
            + _nx16_strip_head(ent))


def _nx16_strip_head(stream: bytes) -> bytes:
    """Strip the (flags, uint7 size) head off a just-encoded Nx16
    stream, leaving the entropy body — the PACK wrapper re-emits its
    own flags/size and splices the body in (the decoder reads the
    entropy stage inline, not as a nested stream)."""
    p = 1
    while stream[p] & 0x80:
        p += 1
    return stream[p + 1:]


# blocks above this size pick their python-side entropy method on a
# prefix SAMPLE first (one cheap pass per candidate), then full-encode
# only the winner — ~3x the write throughput of exhaustive trials at
# <1% size give-up (measured in tests/test_align_write.py); raw/gzip
# always full-encode (gzip is C-side and the safety floor)
_SELECT_SAMPLE_AT = 192 << 10
_SELECT_SAMPLE_BYTES = 64 << 10


def _rans_thunks(raw: bytes, codec: str, names: bool,
                 fqz_recs: list[bytes] | None):
    """(method, encode_over_bytes, encode_over_recs) python-side
    candidate encoders valid for ``raw`` — the htslib candidate set:
    rANS 4x8 o0/o1 (+ Nx16 o0/o1/PACK/RLE, fqzcomp for the QS series,
    tok3 for the RN series under CRAM 3.1)."""
    thunks = [(4, rans4x8_encode, None)]
    if len(raw) >= 4:
        thunks.append((4, rans4x8_encode_o1, None))
    if codec == "rans31":
        thunks.append((5, rans_nx16_encode, None))
        if len(raw) >= 4:
            thunks.append((5, rans_nx16_encode_o1, None))
        nsym = len(set(raw))
        if 2 <= nsym <= 16:
            thunks.append((5, lambda b: rans_nx16_encode_pack(b, 0), None))
            thunks.append((5, lambda b: rans_nx16_encode_pack(b, 1), None))
        # RLE only when runs collapse the stream >= 2x (cheap numpy
        # transition count) — otherwise it cannot win and the extra
        # encodes are wasted CPU per block
        import numpy as _np

        _a = _np.frombuffer(raw, _np.uint8)
        if len(raw) >= 4 and 1 + int(
                _np.count_nonzero(_a[1:] != _a[:-1])) * 2 < len(raw):
            thunks.append((5, lambda b: rans_nx16_encode_rle(b, 0), None))
            thunks.append((5, lambda b: rans_nx16_encode_rle(b, 1), None))
        if fqz_recs:
            # QS series: fqzcomp (method 7), the 3.1 archive profile's
            # quality codec — per-record segments, lengths in-stream;
            # qbits=12/qshift=6 keys the adaptive models on the two
            # previous quals, the shape that beats order-1 rANS on
            # real quality series
            from oxbow_spark.sources.cram_codecs import fqz_encode

            thunks.append((7, None,
                           lambda rs: fqz_encode(rs, qbits=12, qshift=6)))
        if names and raw.endswith(b"\x00"):
            # RN series: the 3.1 name tokenizer (method 8)
            from oxbow_spark.sources.cram_codecs import tok3_encode

            thunks.append((8, None, None))  # resolved below

            def _tok3(b: bytes) -> bytes:
                z = b.rindex(b"\x00")
                return tok3_encode(b[:z + 1])

            thunks[-1] = (8, _tok3, None)
    return thunks


def _block(ctype: int, cid: int, raw: bytes, gz: bool = True,
           codec: str = "gzip", names: bool = False,
           fqz_recs: list[bytes] | None = None) -> bytes:
    method, payload = 0, raw
    if gz and raw:
        if codec in ("rans", "rans31"):
            # real-producer method selection (htslib tries candidate
            # codecs per block and keeps the smallest): raw vs gzip vs
            # the python entropy family (sample-selected on big blocks)
            cands = [(0, raw)]
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            cands.append((1, co.compress(raw) + co.flush()))
            thunks = _rans_thunks(raw, codec, names, fqz_recs)

            def run(t, data, recs):
                m, fb, fr = t
                try:
                    return m, (fr(recs) if fr is not None else fb(data))
                except (ValueError, UnicodeDecodeError):
                    return None  # candidate not applicable to this data

            if len(raw) > _SELECT_SAMPLE_AT and len(thunks) > 1:
                # MARGINAL-rate scoring: encode two prefix samples and
                # rank by the byte delta — fixed per-stream costs
                # (order-1 tables, tok3 stream headers) cancel out, so
                # the ranking reflects the amortized rate the full
                # block will pay, not the sample's table overhead
                small = raw[:_SELECT_SAMPLE_BYTES >> 2]
                sample = raw[:_SELECT_SAMPLE_BYTES]

                def rec_prefix(limit):
                    out, tot = [], 0
                    for r in fqz_recs:
                        out.append(r)
                        tot += len(r)
                        if tot >= limit:
                            break
                    return out

                srecs_s = rec_prefix(_SELECT_SAMPLE_BYTES >> 2) \
                    if fqz_recs else None
                srecs_b = rec_prefix(_SELECT_SAMPLE_BYTES) \
                    if fqz_recs else None
                scored = []
                for t in thunks:
                    lo = run(t, small, srecs_s)
                    hi = run(t, sample, srecs_b)
                    if lo is not None and hi is not None:
                        scored.append((len(hi[1]) - len(lo[1]), t))
                if scored:
                    scored.sort(key=lambda st: st[0])
                    best = run(scored[0][1], raw, fqz_recs)
                    if best is not None:
                        cands.append(best)
            else:
                for t in thunks:
                    out = run(t, raw, fqz_recs)
                    if out is not None:
                        cands.append(out)
            method, payload = min(cands, key=lambda mp: len(mp[1]))
        else:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            comp = co.compress(raw) + co.flush()
            if len(comp) < len(raw):
                method, payload = 1, comp
    out = bytearray()
    out.append(method)
    out.append(ctype)
    out += itf8(cid)
    out += itf8(len(payload))
    out += itf8(len(raw))
    out += payload
    out += struct.pack("<I", zlib.crc32(bytes(out)))
    return bytes(out)


# data series → (stream kind, content id); ids are arbitrary but unique
_INT_SERIES = ["BF", "CF", "RI", "RL", "AP", "RG", "MF", "NS", "NP", "TS",
               "TL", "FN", "FP", "MQ", "BS", "DL", "RS", "HC", "PD"]
_BYTE_SERIES = ["FC", "QS", "BA"]
_STOP_SERIES = ["RN", "IN", "SC", "BB"]  # BYTE_ARRAY_STOP, stop = 0x00


class _SeriesBufs:
    def __init__(self):
        self.bufs: dict[str, bytearray] = {
            k: bytearray() for k in _INT_SERIES + _BYTE_SERIES + _STOP_SERIES}
        # per-record QS segment lengths — the fqzcomp candidate encodes
        # the quality series record-by-record (lengths in-stream)
        self.qs_lens: list[int] = []

    def put_i(self, k: str, v: int) -> None:
        self.bufs[k] += itf8(v)

    def put_b(self, k: str, v: int) -> None:
        self.bufs[k].append(v)

    def put_s(self, k: str, s: bytes) -> None:
        self.bufs[k] += s + b"\x00"


# canonical substitution matrix: for each reference base (BASES order
# "ACGTN"), its alternates in BASES order take 2-bit codes 0..3 —
# byte 0b00011011 per row; `sources/cram.py:sub_matrix` inverts this
_SM_CANONICAL = bytes([0x1B] * 5)
_BASES = "ACGTN"
_ALTS = {r: [b for b in _BASES if b != r] for r in _BASES}


def _features_ref(cigar: str, seq: str, rl: int, refwin: str) -> list:
    """CIGAR + seq + reference window → feature list for the
    REFERENCE-BASED profile (RR=1): matching stretches emit NOTHING
    (the decoder fills them from the reference), single mismatches emit
    'X' substitution codes against `_SM_CANONICAL`, and stretches that
    cannot be coded (read or ref base outside ACGTN, case differences
    — the reference window is compared byte-exact so soft-masked
    lowercase never round-trips wrong) fall back to verbatim 'b' runs.
    ``refwin`` must cover the record's full reference span."""
    ops = _CIGAR_RE.findall(cigar)
    feats = []
    rpos = 0   # 0-based read cursor
    roff = 0   # 0-based cursor into refwin
    for n_s, op in ops:
        n = int(n_s)
        if op in "M=X":
            i = 0
            while i < n:
                if rpos + i < len(seq) and roff + i < len(refwin) \
                        and seq[rpos + i] == refwin[roff + i]:
                    i += 1  # match: no feature
                    continue
                rb = refwin[roff + i] if roff + i < len(refwin) else "N"
                qb = seq[rpos + i] if rpos + i < len(seq) else "N"
                if rb in _ALTS and qb in _ALTS[rb]:
                    feats.append(("X", rpos + i + 1,
                                  _ALTS[rb].index(qb)))
                    i += 1
                else:
                    # group consecutive uncodable bases into one 'b'
                    j = i
                    while j < n:
                        rj = refwin[roff + j] if roff + j < len(refwin) \
                            else "N"
                        qj = seq[rpos + j] if rpos + j < len(seq) else "N"
                        if qj == rj or (rj in _ALTS and qj in _ALTS[rj]):
                            break
                        j += 1
                    feats.append(("b", rpos + i + 1, seq[rpos + i:rpos + j]))
                    i = j
            rpos += n
            roff += n
        elif op == "I":
            feats.append(("I", rpos + 1, seq[rpos:rpos + n]))
            rpos += n
        elif op == "S":
            feats.append(("S", rpos + 1, seq[rpos:rpos + n]))
            rpos += n
        elif op == "D":
            feats.append(("D", rpos + 1, n))
            roff += n
        elif op == "N":
            feats.append(("N", rpos + 1, n))
            roff += n
        elif op == "H":
            feats.append(("H", rpos + 1, n))
        elif op == "P":
            feats.append(("P", rpos + 1, n))
    return feats


def _features(cigar: str | None, seq: str | None, rl: int) -> list:
    """CIGAR + seq → CRAM feature list [(code, read_pos_1based, payload)]
    for the no-ref profile. seq=None uses 'N' placeholders (the caller
    sets CF 0x8 so the decoder nulls the sequence)."""
    if not cigar:
        return []
    ops = _CIGAR_RE.findall(cigar)
    # NB: no FN=0 "perfect match" shortcut — under RR=0 the decoder's
    # reference bases are 'N', so matches must carry their bases via 'b'
    feats = []
    rpos = 0  # 0-based read cursor
    s = seq if seq is not None else "N" * rl
    for n_s, op in ops:
        n = int(n_s)
        if op in "M=X":
            feats.append(("b", rpos + 1, s[rpos:rpos + n]))
            rpos += n
        elif op == "I":
            feats.append(("I", rpos + 1, s[rpos:rpos + n]))
            rpos += n
        elif op == "S":
            feats.append(("S", rpos + 1, s[rpos:rpos + n]))
            rpos += n
        elif op == "D":
            feats.append(("D", rpos + 1, n))
        elif op == "N":
            feats.append(("N", rpos + 1, n))
        elif op == "H":
            feats.append(("H", rpos + 1, n))
        elif op == "P":
            feats.append(("P", rpos + 1, n))
    return feats


class CramWriter(_AlignmentWriter):
    SUFFIX = ".cram"

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        hdr = SamHeader.parse(self.header_text.splitlines())
        self.ref_names = hdr.chrom_names
        self.ref_ids = {nm: i for i, nm in enumerate(self.ref_names)}
        self.records_per_container = int(
            options.get("records_per_container", 10000))
        self.codec = (options.get("codec") or "gzip").lower()
        if self.codec not in ("gzip", "rans"):
            raise ValueError(
                f"cram codec must be 'gzip' or 'rans', got {self.codec!r}")
        self.reference_path = options.get("reference")
        self._ext_ref = None
        self._ref_cache: dict[str, str] = {}
        self.version = str(options.get("version") or "3.0")
        if self.version not in ("3.0", "3.1"):
            raise ValueError(
                f"cram version must be '3.0' or '3.1', got {self.version!r}")
        if self.codec == "rans" and self.version == "3.1":
            # method 5 (rANS Nx16) is only legal on the 3.1 wire
            self.codec = "rans31"

    # -- compression header -------------------------------------------------

    def _comp_header(self) -> bytes:
        pres = bytearray()
        if self.reference_path:
            # reference-based profile: matches come from the FASTA at
            # decode time (the real-producer default; ~3-5x smaller
            # base streams), substitutions code via the canonical SM
            entries = [(b"RR", bytes([1])), (b"SM", _SM_CANONICAL),
                       (b"AP", bytes([0])),
                       (b"RN", bytes([1])), (b"TD", itf8(1) + b"\x00")]
        else:
            entries = [(b"RR", bytes([0])), (b"AP", bytes([0])),
                       (b"RN", bytes([1])), (b"TD", itf8(1) + b"\x00")]
        body = b"".join(k + v for k, v in entries)
        pres += itf8(len(body) + len(itf8(len(entries))))
        pres += itf8(len(entries)) + body

        enc = bytearray()
        items = []
        cid = 1
        self.cids: dict[str, int] = {}
        for k in _INT_SERIES + _BYTE_SERIES:
            self.cids[k] = cid
            params = itf8(cid)
            items.append(k.encode() + itf8(1) + itf8(len(params)) + params)
            cid += 1
        for k in _STOP_SERIES:
            self.cids[k] = cid
            params = bytes([0x00]) + itf8(cid)
            items.append(k.encode() + itf8(5) + itf8(len(params)) + params)
            cid += 1
        body = b"".join(items)
        enc += itf8(len(body) + len(itf8(len(items))))
        enc += itf8(len(items)) + body

        tags = itf8(len(itf8(0))) + itf8(0)  # no tag encodings
        return bytes(pres + enc + tags)

    # -- record encode ------------------------------------------------------

    def _encode(self, d: dict, bufs: _SeriesBufs):
        """Returns (base count, ref id, start1, end1) for container
        metadata and the .crai sidecar (ref id −1 when unmapped)."""
        flag = int(d.get("flag") or 0)
        rname = d.get("rname")
        seq = d.get("seq")
        qual = d.get("qual")
        cigar = d.get("cigar")
        mapped = not (flag & 0x4)
        rl = len(seq) if seq else (
            sum(int(n) for n, op in _CIGAR_RE.findall(cigar) if op in "MIS=X")
            if cigar else (len(qual) if qual and not mapped else 0))
        if seq is None and qual is not None and mapped and not cigar:
            qual = None  # no read length on the wire — documented drop
        cf = 0x2  # detached mate info always explicit
        if qual is not None:
            cf |= 0x1
        if seq is None:
            cf |= 0x8
        bufs.put_i("BF", flag)
        bufs.put_i("CF", cf)
        bufs.put_i("RI", self.ref_ids.get(rname, -1) if rname else -1)
        bufs.put_i("RL", rl)
        bufs.put_i("AP", int(d.get("pos") or 0))
        bufs.put_i("RG", -1)
        qname = d.get("qname")
        bufs.put_s("RN", (qname if qname is not None else "*").encode("ascii"))
        rnext = d.get("rnext")
        bufs.put_i("MF", (1 if flag & 0x20 else 0) | (2 if flag & 0x8 else 0))
        bufs.put_i("NS", self.ref_ids.get(rnext, -1) if rnext else -1)
        bufs.put_i("NP", int(d.get("pnext") or 0))
        bufs.put_i("TS", int(d.get("tlen") or 0))
        bufs.put_i("TL", 0)
        if mapped:
            refwin = None
            pos1 = int(d.get("pos") or 0)
            if (self.reference_path and cigar and seq is not None
                    and pos1 > 0 and rname):
                reflen = sum(int(n) for n, op in _CIGAR_RE.findall(cigar)
                             if op in "MDN=X")
                refwin = self._ref_window(rname, pos1 - 1, reflen)
            feats = (_features_ref(cigar, seq, rl, refwin)
                     if refwin is not None else _features(cigar, seq, rl))
            bufs.put_i("FN", len(feats))
            prev = 0
            for code, fp, payload in feats:
                bufs.put_b("FC", ord(code))
                bufs.put_i("FP", fp - prev)
                prev = fp
                if code == "b":
                    bufs.put_s("BB", payload.encode("ascii"))
                elif code == "X":
                    bufs.put_i("BS", payload)
                elif code == "I":
                    bufs.put_s("IN", payload.encode("ascii"))
                elif code == "S":
                    bufs.put_s("SC", payload.encode("ascii"))
                elif code == "D":
                    bufs.put_i("DL", payload)
                elif code == "N":
                    bufs.put_i("RS", payload)
                elif code == "H":
                    bufs.put_i("HC", payload)
                elif code == "P":
                    bufs.put_i("PD", payload)
            mq = d.get("mapq")
            bufs.put_i("MQ", 255 if mq is None else int(mq))
        else:
            if seq is not None:
                bufs.bufs["BA"] += seq.encode("ascii")
        if qual is not None:
            bufs.bufs["QS"] += bytes(min(ord(c) - 33, 93) for c in qual)
            bufs.qs_lens.append(len(qual))
        rid = self.ref_ids.get(rname, -1) if (rname and mapped) else -1
        pos1 = int(d.get("pos") or 0)  # noqa: F841 (recomputed for clarity)
        reflen = (sum(int(n) for n, op in _CIGAR_RE.findall(cigar)
                      if op in "MDN=X") if cigar else max(rl, 1))
        return rl, rid, pos1, pos1 + max(reflen, 1) - 1

    def _ref_window(self, name: str, start0: int, ln: int) -> str | None:
        """Reference bases [start0, start0+ln) for feature coding, or
        None when the contig is absent from the FASTA (the record then
        falls back to verbatim 'b' coding). Contigs <= 64 MiB cache
        whole per task (the htslib REF_CACHE discipline); larger ones
        fetch the window each time through faidx's bounded reads."""
        if self._ext_ref is None:
            from oxbow_spark.sources.cram import ExternalRef

            self._ext_ref = ExternalRef(self.reference_path)
        fai = self._ext_ref.fai
        if name not in fai:
            return None
        clen = fai[name][0]
        if clen <= 64 << 20:
            win = self._ref_cache.get(name)
            if win is None:
                win = self._ext_ref.fetch(name, 0, clen)
                self._ref_cache[name] = win
            out = win[start0:start0 + ln]
        else:
            out = self._ext_ref.fetch(
                name, start0, min(start0 + ln, clen))
        if len(out) < ln:
            out = out + "N" * (ln - len(out))  # span past contig end
        return out

    # -- container assembly -------------------------------------------------

    def _container(self, bufs: _SeriesBufs, n_records: int, n_bases: int,
                   refs: dict[int, list[int]]) -> bytes:
        # single-reference chunks advertise (ref, start, span) in the
        # container header so region planning prunes them without a .crai
        mapped = {r: se for r, se in refs.items() if r >= 0}
        if len(refs) == 1 and len(mapped) == 1:
            (rid, (lo, hi)), = mapped.items()
            c_ref, c_start, c_span = rid, lo, hi - lo + 1
        elif refs and not mapped:
            c_ref, c_start, c_span = -1, 0, 0  # all unmapped
        else:
            c_ref, c_start, c_span = -2, 0, 0  # multiref
        comp_block = _block(1, 0, self._comp_header())
        data_blocks = []
        used = [(k, self.cids[k]) for k in self.cids if bufs.bufs[k]]
        for k, cid in used:
            fqz_recs = None
            if k == "QS" and self.codec == "rans31" and bufs.qs_lens:
                qs = bytes(bufs.bufs["QS"])
                off = 0
                fqz_recs = []
                for ln in bufs.qs_lens:
                    fqz_recs.append(qs[off:off + ln])
                    off += ln
            data_blocks.append(
                _block(4, cid, bytes(bufs.bufs[k]), codec=self.codec,
                       names=(k == "RN"), fqz_recs=fqz_recs))
        sl = bytearray()
        sl += itf8(-2)          # multiref slice (RI per record)
        sl += itf8(0) + itf8(0)  # start, span
        sl += itf8(n_records)
        sl += ltf8(0)           # record counter
        sl += itf8(len(data_blocks))
        sl += _arr([cid for _k, cid in used])
        sl += itf8(-1)          # no embedded reference
        sl += b"\x00" * 16      # md5 (unchecked in the no-ref profile)
        slice_block = _block(2, 0, bytes(sl), gz=False)

        body = comp_block + slice_block + b"".join(data_blocks)
        head = bytearray()
        head += struct.pack("<i", len(body))
        head += itf8(c_ref) + itf8(c_start) + itf8(c_span)
        head += itf8(n_records)
        head += ltf8(0) + ltf8(n_bases)
        head += itf8(1 + 1 + len(data_blocks))
        head += _arr([len(comp_block)])  # landmark: slice header offset
        head += struct.pack("<I", zlib.crc32(bytes(head)))
        return bytes(head) + body

    def _eof_container(self) -> bytes:
        blk = _block(4, 0, b"", gz=False)
        head = bytearray()
        head += struct.pack("<i", len(blk))
        head += itf8(-1) + itf8(0) + itf8(0)
        head += itf8(0)
        head += ltf8(0) + ltf8(0)
        head += itf8(1)
        head += _arr([])
        head += struct.pack("<I", zlib.crc32(bytes(head)))
        return bytes(head) + blk

    def write(self, iterator: Iterator) -> _PartFile:
        out = self._part_path()
        text = "".join(
            ln.rstrip("\n") + "\n"
            for ln in self.header_text.splitlines() if ln.strip())
        tb = text.encode("ascii")
        hdr_raw = struct.pack("<i", len(tb)) + tb
        hdr_block = _block(4, 0, hdr_raw, gz=False)
        hdr_head = bytearray()
        hdr_head += struct.pack("<i", len(hdr_block))
        hdr_head += itf8(0) + itf8(0) + itf8(0) + itf8(0)
        hdr_head += ltf8(0) + ltf8(0)
        hdr_head += itf8(1)
        hdr_head += _arr([0])
        hdr_head += struct.pack("<I", zlib.crc32(bytes(hdr_head)))

        # chunk records into bounded containers (one slice each): caps
        # writer memory at O(chunk) and gives the reader one partition
        # per container on re-read (intra-file parallelism)
        per = self.records_per_container
        want_crai = (self.options.get("index") or "").lower() == "crai"
        crai_lines: list[str] = []
        total = 0
        with open(out, "wb") as f:
            minor = 1 if self.version == "3.1" else 0
            f.write(b"CRAM" + bytes([3, minor])
                    + b"sparkbow".ljust(20, b"\x00"))
            f.write(bytes(hdr_head) + hdr_block)
            pos_bytes = 26 + len(hdr_head) + len(hdr_block)
            bufs = _SeriesBufs()
            n = 0
            bases = 0
            refs: dict[int, list[int]] = {}

            def flush():
                nonlocal pos_bytes, total, bufs, n, bases, refs
                cont = self._container(bufs, n, bases, refs)
                f.write(cont)
                for rid, (lo, hi) in sorted(refs.items()):
                    crai_lines.append(
                        f"{rid}\t{lo if rid >= 0 else 0}"
                        f"\t{hi - lo + 1 if rid >= 0 else 0}"
                        f"\t{pos_bytes}\t0\t0")
                pos_bytes += len(cont)
                total += n
                bufs = _SeriesBufs()
                n = 0
                bases = 0
                refs = {}

            for row in iterator:
                rl, rid, lo, hi = self._encode(row.asDict(), bufs)
                bases += rl
                se = refs.get(rid)
                if se is None:
                    refs[rid] = [lo, hi]
                else:
                    se[0] = min(se[0], lo)
                    se[1] = max(se[1], hi)
                n += 1
                if n >= per:
                    flush()
            if n:
                flush()
            f.write(self._eof_container())
        if want_crai:
            import gzip

            with gzip.open(out + ".crai", "wt") as fi:
                fi.write("\n".join(crai_lines) + ("\n" if crai_lines else ""))
        return _PartFile(out, total)
