"""CRAM 3.1 auxiliary codecs: name tokenizer (block method 8, "tok3"),
adaptive arithmetic coding (method 6) and the fqzcomp quality codec
(method 7).

Implemented from the public CRAM 3.1 codecs specification
(https://samtools.github.io/hts-specs/CRAMcodecs.pdf) — the same surface
the reference reaches through noodles (`oxbow/src/alignment/scanner/
cram.rs` handles 3.1 containers by delegating to noodles-cram's codec
set). Like the rANS-Nx16 implementation in ``cram.py``, these decoders
are validated by round-tripping against spec-mirroring test-side
encoders (`tests/test_cram_codecs.py`); no 3.1 fixture files exist in
this sandbox, so byte-parity against htslib output is asserted
structurally (wire-format layout, stream framing, model update rules)
rather than against golden files.

Layout notes:
- tok3 splits read names into per-position token streams (type, string,
  char, digits, delta, ...), each compressed with rANS-Nx16
  (``use_arith=0``) or the adaptive arithmetic coder (``use_arith=1``).
- the arithmetic coder is the spec's range coder (32-bit range, 5-byte
  priming) driving adaptive frequency models; method 6 wraps it in the
  same ORDER/PACK/RLE/STRIPE/CAT container as rANS-Nx16.
- fqzcomp models qualities with a configurable context (previous quals,
  position, delta, selector) over the same range coder.
"""

from __future__ import annotations

import struct

from oxbow_spark.sources.cram import Cursor, _uint7, rans_nx16_decode

# --------------------------------------------------------------- tok3

# Token type enumeration (CRAM 3.1 spec §5.3).
T_TYPE = 0      # stream of token types (one per name per position)
T_STRING = 1    # nul-terminated string
T_CHAR = 2      # single byte
T_DIGITS0 = 3   # zero-padded number; width in the DZLEN stream
T_DZLEN = 4     # width bytes for DIGITS0
T_DUP = 5       # whole name equals name[n - dist]
T_DIFF = 6      # name diffs against name[n - dist]
T_DIGITS = 7    # number, no leading zeros (u32)
T_DELTA = 8     # u8 delta vs the same-position token of the ref name
T_DELTA0 = 9    # u8 delta, zero-padded to the ref token's width
T_MATCH = 10    # copy the ref name's same-position token
T_NOP = 11
T_END = 12      # end of name

_N_TYPES = 13


class _ByteStream:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes):
        self.b = b
        self.p = 0

    def u8(self) -> int:
        v = self.b[self.p]
        self.p += 1
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.b, self.p)
        self.p += 4
        return v

    def cstr(self) -> str:
        z = self.b.index(0, self.p)
        s = self.b[self.p:z].decode("ascii")
        self.p = z + 1
        return s


def _tok3_uncompress(payload: bytes, use_arith: bool) -> bytes:
    if use_arith:
        return arith_decode(payload)
    return rans_nx16_decode(payload)


def tok3_decode(data: bytes) -> bytes:
    """Name tokenizer decoder → the original nul-separated name blob.

    Wire format (spec §5.2): u32 ulen, u32 nnames, u8 use_arith, then a
    sequence of token streams, each ``u8 id`` (low 6 bits token type,
    0x40 = first stream of the next token position, 0x80 = duplicate of
    an earlier stream) followed by either (u8 dup_pos, u8 dup_type) or
    (uint7 clen, clen compressed bytes).
    """
    c = Cursor(data) if not isinstance(data, Cursor) else data
    (ulen,) = struct.unpack_from("<I", c.b, c.p); c.p += 4
    (nnames,) = struct.unpack_from("<I", c.b, c.p); c.p += 4
    use_arith = c.u8() != 0

    streams: list[list[_ByteStream | None]] = []
    pos = -1
    while c.p < len(c.b):
        tid = c.u8()
        ttype = tid & 63
        if tid & 0x40:
            pos += 1
            streams.append([None] * _N_TYPES)
        if pos < 0:
            raise ValueError("tok3: stream before first position marker")
        if tid & 0x80:
            dup_pos = c.u8()
            dup_type = c.u8()
            src = streams[dup_pos][dup_type]
            if src is None:
                raise ValueError("tok3: duplicate of a missing stream")
            streams[pos][ttype] = _ByteStream(src.b)
        else:
            clen = _uint7(c)
            raw = bytes(c.b[c.p:c.p + clen])
            c.p += clen
            streams[pos][ttype] = _ByteStream(_tok3_uncompress(raw, use_arith))

    def stream(p: int, t: int) -> _ByteStream:
        s = streams[p][t] if p < len(streams) else None
        if s is None:
            raise ValueError(f"tok3: missing stream (pos={p}, type={t})")
        return s

    # tokens[n][p] = (text, numeric value or None) for back-references
    tokens: list[list[tuple[str, int | None]]] = []
    names: list[str] = []
    out = bytearray()
    for n in range(nnames):
        t0 = stream(0, T_TYPE).u8()
        if t0 == T_DUP:
            dist = stream(0, T_DUP).u32()
            names.append(names[n - dist])
            tokens.append(tokens[n - dist])
            out += names[-1].encode("ascii") + b"\x00"
            continue
        if t0 != T_DIFF:
            raise ValueError(f"tok3: name must start with DUP/DIFF, got {t0}")
        dist = stream(0, T_DIFF).u32()
        ref = tokens[n - dist] if dist else None
        toks: list[tuple[str, int | None]] = [("", None)]  # pos 0 placeholder
        parts: list[str] = []
        p = 1
        while True:
            tt = stream(p, T_TYPE).u8()
            if tt == T_END:
                toks.append(("", None))
                break
            elif tt == T_STRING:
                s = stream(p, T_STRING).cstr()
                toks.append((s, None))
            elif tt == T_CHAR:
                s = chr(stream(p, T_CHAR).u8())
                toks.append((s, None))
            elif tt == T_DIGITS:
                v = stream(p, T_DIGITS).u32()
                toks.append((str(v), v))
            elif tt == T_DIGITS0:
                v = stream(p, T_DIGITS0).u32()
                w = stream(p, T_DZLEN).u8()
                toks.append((str(v).zfill(w), v))
            elif tt == T_DELTA:
                d = stream(p, T_DELTA).u8()
                v = (ref[p][1] if ref else 0) + d
                toks.append((str(v), v))
            elif tt == T_DELTA0:
                d = stream(p, T_DELTA0).u8()
                rv = ref[p] if ref else ("", 0)
                v = (rv[1] or 0) + d
                toks.append((str(v).zfill(len(rv[0])), v))
            elif tt == T_MATCH:
                toks.append(ref[p])
            elif tt == T_NOP:
                toks.append(("", None))
            else:
                raise ValueError(f"tok3: unknown token type {tt}")
            parts.append(toks[-1][0])
            p += 1
        name = "".join(parts)
        names.append(name)
        tokens.append(toks)
        out += name.encode("ascii") + b"\x00"
    if len(out) != ulen:
        raise ValueError(f"tok3 length mismatch: {len(out)} != {ulen}")
    return bytes(out)


def _uint7_w(v: int) -> bytes:
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(v & 0x7F)
        v >>= 7
    out.reverse()
    return bytes([b | 0x80 for b in out[:-1]] + [out[-1]])


def _tok3_tokenize(name: str) -> list[tuple[str, str]]:
    """(kind, text) runs — digit runs vs non-digit runs."""
    runs = []
    i = 0
    n = len(name)
    while i < n:
        j = i
        if name[i].isdigit():
            while j < n and name[j].isdigit():
                j += 1
            runs.append(("d", name[i:j]))
        else:
            while j < n and not name[j].isdigit():
                j += 1
            runs.append(("s", name[i:j]))
        i = j
    return runs


def _tok3_compress_stream(raw: bytes) -> bytes:
    """Best valid Nx16 stream for a tok3 token stream: CAT (stored)
    vs order-0 rANS, smallest wins — every stream must decode through
    `_tok3_uncompress` → `rans_nx16_decode`."""
    cat = bytes([0x20]) + _uint7_w(len(raw)) + raw
    if len(raw) < 16:
        return cat
    from oxbow_spark.sources.cram_write import rans_nx16_encode

    return min(cat, rans_nx16_encode(raw), key=len)


def tok3_encode(names_blob: bytes | list[str]) -> bytes:
    """Name tokenizer ENCODER (CRAM 3.1 spec §5, block method 8) — the
    codec real 3.1 producers use for the RN series. Accepts the RN
    series blob (nul-separated names, the BYTE_ARRAY_STOP layout) or a
    name list. Token selection: DUP for exact repeats of the previous
    name, else DIFF(1) per-position tokens with MATCH / DELTA (u8
    forward delta on unpadded digit runs) / DIGITS / DIGITS0+DZLEN
    (zero-padded, width <= 255) / CHAR / STRING; digit runs that
    overflow u32 fall back to STRING. Token streams are CAT-stored or
    order-0-rANS compressed, whichever is smaller. Exact inverse of
    `tok3_decode`; names must be ASCII (CRAM read names are by spec).
    """
    if isinstance(names_blob, (bytes, bytearray)):
        blob = bytes(names_blob)
        if not blob.endswith(b"\x00"):
            raise ValueError("tok3: RN blob must be nul-terminated")
        names = [s.decode("ascii") for s in blob.split(b"\x00")[:-1]]
    else:
        names = list(names_blob)
        blob = b"".join(n.encode("ascii") + b"\x00" for n in names)
    if not names:
        raise ValueError("tok3: no names")

    streams: dict[tuple[int, int], bytearray] = {}

    def put(pos: int, typ: int, b: bytes) -> None:
        streams.setdefault((pos, typ), bytearray()).extend(b)

    prev_runs: list[tuple[str, str]] | None = None
    prev_name: str | None = None
    for name in names:
        if name == prev_name:
            put(0, T_TYPE, bytes([T_DUP]))
            put(0, T_DUP, struct.pack("<I", 1))
            continue
        runs = _tok3_tokenize(name)
        put(0, T_TYPE, bytes([T_DIFF]))
        dist = 1 if prev_runs is not None else 0
        put(0, T_DIFF, struct.pack("<I", dist))
        ref = prev_runs if dist else None
        for p, (kind, text) in enumerate(runs, start=1):
            rtok = ref[p - 1] if ref and p - 1 < len(ref) else None
            if rtok == (kind, text):
                put(p, T_TYPE, bytes([T_MATCH]))
            elif kind == "d":
                v = int(text)
                zero_padded = text[0] == "0" and len(text) > 1
                if v >= 1 << 32 or (zero_padded and len(text) > 255):
                    put(p, T_TYPE, bytes([T_STRING]))
                    put(p, T_STRING, text.encode("ascii") + b"\x00")
                    continue
                rv = (int(rtok[1])
                      if rtok and rtok[0] == "d" and int(rtok[1]) < 1 << 32
                      else None)
                if (rv is not None and 0 <= v - rv <= 255
                        and not zero_padded and rtok[1][0] != "0"):
                    put(p, T_TYPE, bytes([T_DELTA]))
                    put(p, T_DELTA, bytes([v - rv]))
                elif zero_padded:
                    put(p, T_TYPE, bytes([T_DIGITS0]))
                    put(p, T_DIGITS0, struct.pack("<I", v))
                    put(p, T_DZLEN, bytes([len(text)]))
                else:
                    put(p, T_TYPE, bytes([T_DIGITS]))
                    put(p, T_DIGITS, struct.pack("<I", v))
            elif len(text) == 1:
                put(p, T_TYPE, bytes([T_CHAR]))
                put(p, T_CHAR, text.encode("ascii"))
            else:
                put(p, T_TYPE, bytes([T_STRING]))
                put(p, T_STRING, text.encode("ascii") + b"\x00")
        put(len(runs) + 1, T_TYPE, bytes([T_END]))
        prev_runs = runs
        prev_name = name

    out = bytearray(struct.pack("<II", len(blob), len(names)))
    out.append(0)  # rANS-compressed streams (not arith)
    max_pos = max(p for p, _ in streams)
    for pos in range(max_pos + 1):
        first = True
        for typ in sorted(t for (p, t) in streams if p == pos):
            comp = _tok3_compress_stream(bytes(streams[(pos, typ)]))
            out.append(typ | (0x40 if first else 0))
            first = False
            out += _uint7_w(len(comp)) + comp
    return bytes(out)


# ------------------------------------------------- adaptive range coder

class RangeDecoder:
    """Spec §2.1 range coder (decoder side): 32-bit range, 5-byte code
    priming, byte-wise renormalization at 2^24."""

    __slots__ = ("b", "p", "range", "code")

    def __init__(self, b: bytes, p: int = 0):
        self.b = b
        self.p = p
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(5):
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFFFF
        self.code &= 0xFFFFFFFF

    def _byte(self) -> int:
        if self.p < len(self.b):
            v = self.b[self.p]
            self.p += 1
            return v
        return 0

    def get_freq(self, tot: int) -> int:
        self.range //= tot
        return self.code // self.range

    def decode(self, cum: int, freq: int) -> None:
        self.code -= cum * self.range
        self.range *= freq
        while self.range < (1 << 24):
            self.range <<= 8
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFFFFFF


class RangeEncoder:
    """Encoder twin of `RangeDecoder` (used by the test-side encoders;
    kept here so the carry/renormalization rules live next to the
    decoder they must mirror)."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.out = bytearray()
        self._started = False

    def encode(self, cum: int, freq: int, tot: int) -> None:
        self.range //= tot
        self.low += cum * self.range
        self.range *= freq
        if self.low > 0xFFFFFFFFFF:
            # carry propagation into already-emitted bytes
            i = len(self.out) - 1
            while i >= 0:
                self.out[i] = (self.out[i] + 1) & 0xFF
                if self.out[i]:
                    break
                i -= 1
            self.low &= 0xFFFFFFFFFF
        while self.range < (1 << 24):
            self.range <<= 8
            self.out.append((self.low >> 32) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFFFF

    def finish(self) -> bytes:
        for _ in range(5):
            self.out.append((self.low >> 32) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFFFF
        return bytes(self.out)


class AdaptiveModel:
    """Spec §2.2 adaptive frequency model: symbol frequencies start at 1,
    bump by STEP on use, halve (floor 1) when the total crosses MAX_FREQ.
    Symbol lookup is linear over a most-recently-frequent ordering (the
    encoder must apply the identical bubble-up rule)."""

    STEP = 16
    MAX_FREQ = (1 << 16) - 32

    __slots__ = ("syms", "freqs", "total")

    def __init__(self, nsym: int):
        self.syms = list(range(nsym))
        self.freqs = [1] * nsym
        self.total = nsym

    def _bump(self, i: int) -> None:
        self.freqs[i] += self.STEP
        self.total += self.STEP
        if i > 0 and self.freqs[i] > self.freqs[i - 1]:
            self.syms[i - 1], self.syms[i] = self.syms[i], self.syms[i - 1]
            self.freqs[i - 1], self.freqs[i] = self.freqs[i], self.freqs[i - 1]
        if self.total > self.MAX_FREQ:
            self.total = 0
            for j, f in enumerate(self.freqs):
                self.freqs[j] = (f + 1) >> 1
                self.total += self.freqs[j]

    def decode(self, rc: RangeDecoder) -> int:
        f = rc.get_freq(self.total)
        cum = 0
        i = 0
        while cum + self.freqs[i] <= f:
            cum += self.freqs[i]
            i += 1
        rc.decode(cum, self.freqs[i])
        sym = self.syms[i]
        self._bump(i)
        return sym

    def encode(self, rc: RangeEncoder, sym: int) -> None:
        i = self.syms.index(sym)
        cum = sum(self.freqs[:i])
        rc.encode(cum, self.freqs[i], self.total)
        self._bump(i)


# --------------------------------------------- method 6: arith (Nx16 wrap)

def _arith_order0(c: Cursor, n_out: int, max_sym: int) -> bytes:
    rc = RangeDecoder(c.b, c.p)
    model = AdaptiveModel(max_sym)
    out = bytearray(n_out)
    for i in range(n_out):
        out[i] = model.decode(rc)
    c.p = rc.p
    return bytes(out)


def _arith_order1(c: Cursor, n_out: int, max_sym: int) -> bytes:
    rc = RangeDecoder(c.b, c.p)
    models = [AdaptiveModel(max_sym) for _ in range(max_sym)]
    out = bytearray(n_out)
    prev = 0
    for i in range(n_out):
        prev = out[i] = models[prev].decode(rc)
    c.p = rc.p
    return bytes(out)


def arith_decode(data: bytes, n_out: int | None = None) -> bytes:
    """Adaptive arithmetic coder, CRAM 3.1 block method 6: the rANS-Nx16
    container flags (ORDER/STRIPE/NOSZ/CAT/RLE/PACK; no X32) around
    range-coded payloads with adaptive order-0/order-1 models. Spec §4."""
    from oxbow_spark.sources import cram as _cram

    c = Cursor(data) if not isinstance(data, Cursor) else data
    flags = c.u8()
    order = flags & 1
    if not flags & 0x10:  # NOSZ unset
        n_out = _uint7(c)
    if flags & 0x08:  # STRIPE
        if n_out is None:
            raise ValueError("arith NOSZ STRIPE stream needs an expected size")
        n_lanes = c.u8()
        lane_lens = [_uint7(c) for _ in range(n_lanes)]
        lanes = []
        for j, ll in enumerate(lane_lens):
            sub = Cursor(bytes(c.b[c.p:c.p + ll]))
            c.p += ll
            lanes.append(arith_decode(sub, (n_out - j + n_lanes - 1) // n_lanes))
        out = bytearray(n_out)
        for j, lane in enumerate(lanes):
            out[j::n_lanes] = lane
        return bytes(out)
    pack_syms = None
    n_unpack = None
    if flags & 0x80:  # PACK
        nsym = c.u8()
        pack_syms = [c.u8() for _ in range(nsym)]
        n_unpack = _uint7(c)
    rle_meta = None
    n_entropy = n_unpack if pack_syms is not None else n_out
    if flags & 0x40:  # RLE
        rle_meta, n_entropy = _cram._nx16_read_rle_meta(c)
    if flags & 0x20:  # CAT
        take = n_entropy if n_entropy is not None else len(c.b) - c.p
        payload = bytes(c.b[c.p:c.p + take])
        c.p += take
    elif flags & 0x04:  # EXT: external general-purpose codec (bzip2)
        import bz2

        payload = bz2.decompress(bytes(c.b[c.p:]))
        c.p = len(c.b)
        if n_entropy is not None and len(payload) != n_entropy:
            raise ValueError(
                f"arith EXT length mismatch: {len(payload)} != {n_entropy}"
            )
    else:
        max_sym = c.u8() or 256
        if order:
            payload = _arith_order1(c, n_entropy, max_sym)
        else:
            payload = _arith_order0(c, n_entropy, max_sym)
    if rle_meta is not None:
        payload = _cram._nx16_rle_expand(
            payload, rle_meta, n_unpack if pack_syms is not None else n_out
        )
    if pack_syms is not None:
        payload = _cram._nx16_unpack(payload, pack_syms, n_out)
    if n_out is not None and len(payload) != n_out:
        raise ValueError(f"arith length mismatch: {len(payload)} != {n_out}")
    return payload


# ------------------------------------------------- method 7: fqzcomp

class _FqzParams:
    __slots__ = (
        "context", "pflags", "max_sym", "qbits", "qshift", "qloc",
        "sloc", "ploc", "dloc", "qmap", "qtab", "ptab", "dtab",
        "do_dedup", "fixed_len", "do_sel", "do_rev",
    )


_FQZ_GFLAG_MULTI = 1      # multiple parameter sets + selector
_FQZ_GFLAG_HAVE_STAB = 2  # explicit selector→param table
_FQZ_GFLAG_DO_REV = 4     # reverse flagged records at the end

_FQZ_PFLAG_HAVE_QMAP = 1
_FQZ_PFLAG_HAVE_DTAB = 2
_FQZ_PFLAG_HAVE_PTAB = 4
_FQZ_PFLAG_HAVE_QTAB = 8
_FQZ_PFLAG_FIXED_LEN = 16
_FQZ_PFLAG_DO_SEL = 32
_FQZ_PFLAG_DO_DEDUP = 64


def _read_array(c: Cursor, n: int) -> list[int]:
    """Plain ``n`` x u8 table (used for the selector table)."""
    return [c.u8() for _ in range(n)]


def _fqz_read_rl_array(c: Cursor, size: int) -> list[int]:
    """Run-length packed context table (qtab/ptab/dtab).

    Layout (CRAM 3.1 codecs spec, fqzcomp parameter arrays): the table is
    stored as the run length of each successive VALUE (0, 1, 2, ...); a
    zero run skips a value, and a run byte of 255 saturates — the next
    byte extends the SAME value (a run of exactly 255 is written
    ``255, 0``). On top, the run-length byte stream is itself
    replication-escaped: a byte equal to the immediately preceding
    literal is followed by a count of additional copies. Round-trip
    verified against the mirrored writer in tests/test_cram_codecs.py
    (no htslib in this container to cross-check byte framing against
    real "small"/"archive"-profile output)."""
    # stage 1: undo the replication escape → per-value run-length list
    runs: list[int] = []
    total = 0
    last = -1
    while total < size:
        b = c.u8()
        if b == last:
            rep = c.u8()
            runs.extend([b] * rep)
            total += b * rep
            last = -1
        else:
            runs.append(b)
            total += b
            last = b
        if len(runs) > 2 * size + 16:
            raise ValueError("fqzcomp table: runaway run-length stream")
    # stage 2: expand runs of consecutive values; a 255 run saturates
    # (the value does not advance), so longer runs chain 255s and a run
    # of exactly 255 is written "255, 0"
    arr: list[int] = []
    v = 0
    for run in runs:
        arr.extend([v] * run)
        if run != 255:
            v += 1
        if len(arr) >= size:
            break
    if len(arr) < size:
        arr.extend([v] * (size - len(arr)))
    return arr[:size]


def _fqz_read_params(c: Cursor) -> _FqzParams:
    p = _FqzParams()
    (p.context,) = struct.unpack_from("<H", c.b, c.p); c.p += 2
    p.pflags = c.u8()
    p.max_sym = c.u8()
    x = c.u8()
    p.qbits = x >> 4
    p.qshift = x & 15
    x = c.u8()
    p.qloc = x >> 4
    p.sloc = x & 15
    x = c.u8()
    p.ploc = x >> 4
    p.dloc = x & 15
    p.do_dedup = bool(p.pflags & _FQZ_PFLAG_DO_DEDUP)
    p.do_sel = bool(p.pflags & _FQZ_PFLAG_DO_SEL)
    p.qmap = (
        [c.u8() for _ in range(p.max_sym)]
        if p.pflags & _FQZ_PFLAG_HAVE_QMAP else None
    )
    # explicit run-length packed context tables (htslib "small"/"archive"
    # profiles); identity/zero defaults otherwise
    p.qtab = (
        _fqz_read_rl_array(c, 256)
        if p.pflags & _FQZ_PFLAG_HAVE_QTAB else list(range(256))
    )
    p.ptab = (
        _fqz_read_rl_array(c, 1024)
        if p.pflags & _FQZ_PFLAG_HAVE_PTAB else [0] * 1024
    )
    p.dtab = (
        _fqz_read_rl_array(c, 256)
        if p.pflags & _FQZ_PFLAG_HAVE_DTAB else [0] * 256
    )
    p.fixed_len = bool(p.pflags & _FQZ_PFLAG_FIXED_LEN)
    return p


def fqz_decode(data: bytes, n_out: int) -> bytes:
    """fqzcomp quality decoder (spec §6): adaptive context-modelled
    qualities over the range coder, self-framing (per-record lengths are
    themselves range-coded, so only the block's uncompressed size is
    needed).

    Context per quality (htscodecs fqz_update_ctx order): the first
    symbol of each record codes under the parameter set's base
    ``context``; afterwards the accumulator updates as
    ``qctx = (qctx << qshift) + qtab[q]`` (q = the coded SYMBOL, table
    applied before accumulation, accumulator unmasked) and the next
    context is ``context + ((qctx & ((1<<qbits)-1)) << qloc) +
    (ptab[min(pos,1023)] << ploc) + (dtab[min(delta,255)] << dloc) +
    (sel << sloc)`` masked to 16 bits, where ``pos`` counts DOWN from
    the record length (read, then decremented) and ``delta`` counts
    symbol changes.

    VALIDATION STATUS: every spec branch is round-trip verified against
    the spec-mirroring encoders in ``tests/test_cram_codecs.py`` —
    single and MULTI parameter sets, HAVE_STAB selector tables,
    per-param DO_SEL context mixing, QMAP symbol maps, FIXED_LEN,
    DO_REV record reversal, dedup, explicit q/p/d tables, and empty
    records (round 5 also fixed the selector-stream gate to htscodecs'
    ``max_sel > 0`` rule — selectors are coded in every multi-param
    stream, DO_SEL only mixes them into the context). Still NOT
    byte-checked against a stream produced by htslib/htscodecs itself:
    no such fixture, library, or network exists in this container, so a
    committed real-producer stream remains the one outstanding
    cross-check. If some convention diverges from real producers,
    'small'/'archive' profile CRAMs would decode wrong bytes without
    error — treat real-producer fqzcomp streams as unvalidated until
    that fixture lands.
    """
    c = Cursor(data) if not isinstance(data, Cursor) else data
    vers = c.u8()
    if vers != 5:
        raise ValueError(f"fqzcomp version {vers} unsupported (expect 5)")
    gflags = c.u8()
    nparam = c.u8() if gflags & _FQZ_GFLAG_MULTI else 1
    max_sel = nparam - 1
    stab = list(range(256))
    if gflags & _FQZ_GFLAG_HAVE_STAB:
        max_sel = c.u8()
        stab = _read_array(c, max_sel + 1) + [0] * (255 - max_sel)
    params = [_fqz_read_params(c) for _ in range(nparam)]

    rc = RangeDecoder(c.b, c.p)
    max_sym = max(p.max_sym for p in params)
    qmodels: dict[int, AdaptiveModel] = {}

    def qmodel(ctx: int) -> AdaptiveModel:
        m = qmodels.get(ctx)
        if m is None:
            m = qmodels[ctx] = AdaptiveModel(max_sym)
        return m

    # selector stream presence is keyed on max_sel > 0 (htscodecs
    # fqz_decode): a multi-param stream codes a selector per record even
    # when no param mixes it into the context — PFLAG_DO_SEL only
    # controls the context mixing, not the stream
    do_sel = max_sel > 0
    sel_model = AdaptiveModel(max(max_sel + 1, 1))
    len_models = [AdaptiveModel(256) for _ in range(4)]
    dup_model = AdaptiveModel(2)
    rev_model = AdaptiveModel(2)

    def read_len() -> int:
        v = 0
        for i in range(4):
            v |= len_models[i].decode(rc) << (8 * i)
        return v

    out = bytearray()
    prev_qual: bytes | None = None
    fixed: int | None = None
    rev_flags: list[tuple[int, int, int]] = []  # (start, length, reversed)
    empty_streak = 0  # zero-progress guard state (see below)
    while len(out) < n_out:
        sel = sel_model.decode(rc) if do_sel else 0
        x = stab[sel] if gflags & _FQZ_GFLAG_HAVE_STAB else min(sel, nparam - 1)
        p = params[x]
        if p.fixed_len:
            if fixed is None:
                fixed = read_len()
            qlen = fixed
        else:
            qlen = read_len()
        if gflags & _FQZ_GFLAG_DO_REV:
            r = rev_model.decode(rc)
            rev_flags.append((len(out), qlen, r))
        if p.do_dedup and prev_qual is not None and len(prev_qual) == qlen:
            if dup_model.decode(rc):
                out += prev_qual
                continue
        if qlen == 0:
            # Legitimate empty records advance the range-coder stream but
            # not the output; a truncated/corrupt stream decodes qlen=0
            # forever off the decoder's trailing-zero padding. The range
            # coder NORMALLY exhausts its input while the last few real
            # records are still in flight (it reads ahead), so input
            # exhaustion alone must not trip the guard — a valid stream
            # can end with a long run of empty quality records. Only an
            # absurd streak (far beyond any real container's record
            # count per slice) marks the stream truncated; the bound
            # exists purely to stop an executor from spinning forever.
            empty_streak += 1
            if empty_streak > 1 << 20:
                raise ValueError(
                    "fqzcomp: no progress decoding zero-length records "
                    f"({len(out)}/{n_out} bytes; truncated stream?)"
                )
            prev_qual = b""  # mirror of the encoder's unconditional prev = q
            continue
        empty_streak = 0
        start = len(out)
        qctx = 0
        prevq = 0
        delta = 0
        pos = qlen
        qmask = (1 << p.qbits) - 1
        ctx = p.context & 0xFFFF  # first symbol: base context only
        for _i in range(qlen):
            q = qmodel(ctx).decode(rc)
            out.append(p.qmap[q] if p.qmap is not None else q)
            # htscodecs fqz_update_ctx: qtab applied to the new symbol
            # before accumulation, accumulator unmasked; ptab read at the
            # current countdown position, then decremented
            qctx = ((qctx << p.qshift) + p.qtab[q]) & 0xFFFFFFFF
            ctx = p.context
            ctx += (qctx & qmask) << p.qloc
            ctx += p.ptab[min(pos, 1023)] << p.ploc
            pos -= 1
            ctx += p.dtab[min(delta, 255)] << p.dloc
            if prevq != q:
                delta += 1
            prevq = q
            if p.do_sel:
                ctx += sel << p.sloc
            ctx &= 0xFFFF
        prev_qual = bytes(out[start:])
    if len(out) != n_out:
        raise ValueError(f"fqzcomp length mismatch: {len(out)} != {n_out}")
    for start, ln, r in rev_flags:
        if r:
            out[start:start + ln] = out[start:start + ln][::-1]
    return bytes(out)


# ----------------------------------------------------------- fqz encode

def fqz_write_rl_array(arr: list[int]) -> bytes:
    """Mirror of `_fqz_read_rl_array`: per-value run lengths (255
    saturates the value; a run of exactly 255 is written 255,0), then a
    replication escape over the run-length bytes (a byte equal to the
    previous literal is followed by a count of additional copies — the
    writer always emits count 0, which round-trips)."""
    runs: list[int] = []
    v = 0
    i = 0
    n = len(arr)
    while i < n:
        if arr[i] != v:
            assert arr[i] > v, "table must be non-decreasing"
            runs.append(0)  # zero run skips a value
            v += 1
            continue
        run = 0
        while i < n and arr[i] == v:
            run += 1
            i += 1
        while run >= 255:
            runs.append(255)
            run -= 255
        # the reader stops once `size` entries are emitted, so a trailing
        # zero remainder (exact-255 chain at end of table) is dropped
        if run > 0 or i < n:
            runs.append(run)
        v += 1
        if i >= n:
            break
    # replication escape over the run bytes: k>=2 consecutive equal bytes
    # b become "b, b, k-1" (the reader adds 1 literal + (k-1) escaped)
    out = bytearray()
    i = 0
    while i < len(runs):
        b = runs[i]
        j = i
        while j < len(runs) and runs[j] == b:
            j += 1
        k = j - i
        out.append(b)
        if k > 1:
            assert k - 1 <= 255, "run-byte repeat overflows escape count"
            out.append(b)
            out.append(k - 1)
        i = j
    return bytes(out)


def fqz_encode(quals: list[bytes], qbits: int = 6, qshift: int = 3,
               do_dedup: bool = False, qtab: list[int] | None = None,
               ptab: list[int] | None = None, dtab: list[int] | None = None,
               qloc: int = 0, ploc: int = 7, dloc: int = 11) -> bytes:
    """Spec-mirroring single-parameter fqzcomp encoder (lengths
    in-stream; optional explicit run-length packed context tables)."""
    pflags = _FQZ_PFLAG_DO_DEDUP if do_dedup else 0
    if qtab is not None:
        pflags |= _FQZ_PFLAG_HAVE_QTAB
    if ptab is not None:
        pflags |= _FQZ_PFLAG_HAVE_PTAB
    if dtab is not None:
        pflags |= _FQZ_PFLAG_HAVE_DTAB
    max_sym = max((max(q) for q in quals if q), default=0) + 1
    sloc = 15
    if qtab is None and ptab is None and dtab is None:
        qloc, ploc, dloc = 0, 15, 15  # quals only in the context
    head = bytearray([5, 0])  # vers, gflags
    head += struct.pack("<H", 0)  # base context
    head += bytes([pflags, max_sym, (qbits << 4) | qshift,
                   (qloc << 4) | sloc, (ploc << 4) | dloc])
    if qtab is not None:
        head += fqz_write_rl_array(qtab)
    if ptab is not None:
        head += fqz_write_rl_array(ptab)
    if dtab is not None:
        head += fqz_write_rl_array(dtab)
    eq_qtab = qtab if qtab is not None else list(range(256))
    eq_ptab = ptab if ptab is not None else [0] * 1024
    eq_dtab = dtab if dtab is not None else [0] * 256

    enc = RangeEncoder()
    qmodels: dict[int, AdaptiveModel] = {}

    def qmodel(ctx):
        m = qmodels.get(ctx)
        if m is None:
            m = qmodels[ctx] = AdaptiveModel(max_sym)
        return m

    len_models = [AdaptiveModel(256) for _ in range(4)]
    dup_model = AdaptiveModel(2)
    qmask = (1 << qbits) - 1
    prev = None
    for q in quals:
        for i in range(4):
            len_models[i].encode(enc, (len(q) >> (8 * i)) & 0xFF)
        if do_dedup and prev is not None and len(prev) == len(q):
            dup_model.encode(enc, 1 if q == prev else 0)
            if q == prev:
                continue
        # mirror of fqz_decode's htscodecs-order context updates
        qctx = 0
        prevq = 0
        delta = 0
        pos = len(q)
        ctx = 0  # base context (0) for the first symbol
        for v in q:
            qmodel(ctx).encode(enc, v)
            qctx = ((qctx << qshift) + eq_qtab[v]) & 0xFFFFFFFF
            ctx = (qctx & qmask) << qloc
            ctx += eq_ptab[min(pos, 1023)] << ploc
            pos -= 1
            ctx += eq_dtab[min(delta, 255)] << dloc
            if prevq != v:
                delta += 1
            prevq = v
            ctx &= 0xFFFF
        prev = q
    return bytes(head) + enc.finish()
