"""Round-trip tests for the CRAM 3.1 auxiliary codecs (tok3 name
tokenizer, adaptive arithmetic coder, fqzcomp quality codec) against
spec-mirroring test-side encoders — the same strategy as
tests/test_rans_nx16.py (no 3.1 fixture files exist in this sandbox)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oxbow_spark.sources.cram_codecs import (
    AdaptiveModel,
    RangeDecoder,
    RangeEncoder,
    T_CHAR,
    T_DELTA,
    T_DIFF,
    T_DIGITS,
    T_DIGITS0,
    T_DUP,
    T_DZLEN,
    T_END,
    T_MATCH,
    T_STRING,
    T_TYPE,
    arith_decode,
    fqz_decode,
    tok3_decode,
)

# ------------------------------------------------------------ range coder


@given(st.lists(st.integers(0, 15), min_size=1, max_size=500))
@settings(max_examples=25, deadline=None)
def test_range_coder_model_roundtrip(syms):
    enc = RangeEncoder()
    m = AdaptiveModel(16)
    for s in syms:
        m.encode(enc, s)
    payload = enc.finish()
    rc = RangeDecoder(payload)
    m2 = AdaptiveModel(16)
    assert [m2.decode(rc) for _ in syms] == syms


def test_adaptive_model_rescale():
    # force enough updates to cross MAX_FREQ and halve
    enc = RangeEncoder()
    m = AdaptiveModel(4)
    seq = ([0] * 3000 + [1, 2, 3] * 700) * 2
    for s in seq:
        m.encode(enc, s)
    rc = RangeDecoder(enc.finish())
    m2 = AdaptiveModel(4)
    assert [m2.decode(rc) for _ in seq] == seq


# -------------------------------------------------------- arith (method 6)


def uint7(v: int) -> bytes:
    out = []
    while True:
        out.append(v & 0x7F)
        v >>= 7
        if not v:
            break
    out.reverse()
    for i in range(len(out) - 1):
        out[i] |= 0x80
    return bytes(out)


def arith_encode(data: bytes, order: int = 0) -> bytes:
    max_sym = (max(data) + 1) if data else 1
    # wire format: 0 means 256 (the decoder reads `u8() or 256`)
    head = bytes([order]) + uint7(len(data)) + bytes([max_sym & 0xFF])
    enc = RangeEncoder()
    if order:
        models = [AdaptiveModel(max_sym) for _ in range(max_sym)]
        prev = 0
        for b in data:
            models[prev].encode(enc, b)
            prev = b
    else:
        m = AdaptiveModel(max_sym)
        for b in data:
            m.encode(enc, b)
    return head + enc.finish()


@given(st.binary(min_size=1, max_size=400))
@settings(max_examples=25, deadline=None)
def test_arith_order0_roundtrip(data):
    assert arith_decode(arith_encode(data, 0)) == data


@given(st.binary(min_size=1, max_size=400))
@settings(max_examples=25, deadline=None)
def test_arith_order1_roundtrip(data):
    assert arith_decode(arith_encode(data, 1)) == data


def test_arith_cat():
    data = b"hello arith CAT"
    blob = bytes([0x20]) + uint7(len(data)) + data
    assert arith_decode(blob) == data


# ---------------------------------------------------------------- tok3


def _nx16_cat(data: bytes) -> bytes:
    """A valid rANS-Nx16 stream in CAT mode (flags 0x20, explicit size)."""
    return bytes([0x20]) + uint7(len(data)) + data


def _tokenize(name: str) -> list[tuple[int, str]]:
    """Split a name into (kind, text) runs: digit runs vs other runs."""
    runs = []
    i = 0
    while i < len(name):
        j = i
        if name[i].isdigit():
            while j < len(name) and name[j].isdigit():
                j += 1
            runs.append(("d", name[i:j]))
        else:
            while j < len(name) and not name[j].isdigit():
                j += 1
            runs.append(("s", name[i:j]))
        i = j
    return runs


def tok3_encode(names: list[str], use_arith: bool = False) -> bytes:
    """Spec-mirroring encoder: DUP for exact repeats of the previous
    name, else DIFF(1)-based per-position tokens with MATCH / DELTA /
    DIGITS / DIGITS0 / STRING / CHAR selection."""
    streams: dict[tuple[int, int], bytearray] = {}

    def put(pos: int, typ: int, b: bytes):
        streams.setdefault((pos, typ), bytearray()).extend(b)

    prev_runs: list[tuple[int, str]] | None = None
    prev_name: str | None = None
    for name in names:
        if name == prev_name:
            put(0, T_TYPE, bytes([T_DUP]))
            put(0, T_DUP, struct.pack("<I", 1))
            continue
        runs = _tokenize(name)
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
                rv = int(rtok[1]) if rtok and rtok[0] == "d" else None
                if (
                    rv is not None and 0 <= v - rv <= 255
                    and not zero_padded and rtok[1][0] != "0"
                ):
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
                put(p, T_CHAR, text.encode())
            else:
                put(p, T_TYPE, bytes([T_STRING]))
                put(p, T_STRING, text.encode() + b"\x00")
        put(len(runs) + 1, T_TYPE, bytes([T_END]))
        prev_runs = runs
        prev_name = name

    blob = b"".join(n.encode() + b"\x00" for n in names)
    out = bytearray(struct.pack("<II", len(blob), len(names)))
    out.append(1 if use_arith else 0)
    max_pos = max(p for p, _ in streams)
    for pos in range(max_pos + 1):
        first = True
        for typ in sorted(t for (p, t) in streams if p == pos):
            comp = (
                arith_encode(bytes(streams[(pos, typ)]))
                if use_arith else _nx16_cat(bytes(streams[(pos, typ)]))
            )
            tid = typ | (0x40 if first else 0)
            first = False
            out.append(tid)
            out += uint7(len(comp)) + comp
    return bytes(out)


NAMES = [
    "read.1.0001",
    "read.1.0002",
    "read.1.0002",      # exact dup
    "read.2.0002",
    "read.2.0150",
    "instr:77:X9",
    "instr:78:X9",
    "solo",
]


@pytest.mark.parametrize("use_arith", [False, True])
def test_tok3_roundtrip(use_arith):
    blob = tok3_encode(NAMES, use_arith)
    want = b"".join(n.encode() + b"\x00" for n in NAMES)
    assert tok3_decode(blob) == want


def test_tok3_duplicate_stream_flag():
    # a stream marked 0x80 reuses an earlier (pos, type) stream
    names = ["a1", "a2"]
    blob = bytearray(tok3_encode(names))
    # decode unchanged first (sanity)
    assert tok3_decode(bytes(blob)).split(b"\x00")[:2] == [b"a1", b"a2"]


def test_tok3_rejects_bad_length():
    blob = bytearray(tok3_encode(["x1"]))
    struct.pack_into("<I", blob, 0, 999)
    with pytest.raises(ValueError, match="length mismatch"):
        tok3_decode(bytes(blob))


# --------------------------------------------------------------- fqzcomp


from oxbow_spark.sources.cram_codecs import (  # noqa: E402
    fqz_encode,
    fqz_write_rl_array,
)


@given(st.lists(st.binary(min_size=0, max_size=80).map(
    lambda b: bytes(x % 45 for x in b)), min_size=1, max_size=12))
@settings(max_examples=20, deadline=None)
def test_fqz_roundtrip(quals):
    blob = fqz_encode(quals)
    want = b"".join(quals)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_dedup():
    quals = [bytes([30] * 20), bytes([30] * 20), bytes([31] * 20)]
    blob = fqz_encode(quals, do_dedup=True)
    want = b"".join(quals)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_rejects_bad_version():
    with pytest.raises(ValueError, match="version"):
        fqz_decode(b"\x04\x00", 0)


# quantized qtab (qbits<8 bucketing), stepped ptab/dtab — the shapes
# htslib's small/archive profiles emit
_QTAB_Q4 = [min(q // 16, 15) for q in range(256)]
_PTAB_STEP = [min(p // 128, 7) for p in range(1024)]
_DTAB_STEP = [min(d // 32, 7) for d in range(256)]


def test_fqz_rl_array_roundtrip():
    from oxbow_spark.sources.cram_codecs import Cursor, _fqz_read_rl_array

    for arr, size in [
        (_QTAB_Q4, 256), (_PTAB_STEP, 1024), (_DTAB_STEP, 256),
        (list(range(256)), 256),          # identity (all runs 1)
        ([0] * 1024, 1024),               # one 1024-run (255 chaining)
        ([0] * 255 + [1], 256),           # exact-255 run mid-table
        ([0] * 256, 256),                 # exact-255 chain + remainder 1
        ([5] * 10 + [9] * 246, 256),      # leading + mid value skips
    ]:
        blob = fqz_write_rl_array(arr)
        got = _fqz_read_rl_array(Cursor(blob + b"\xAA\xBB"), size)
        assert got == arr, (arr[:8], got[:8])


@given(st.lists(st.binary(min_size=0, max_size=60).map(
    lambda b: bytes(x % 45 for x in b)), min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_fqz_roundtrip_explicit_tables(quals):
    blob = fqz_encode(
        quals, qbits=4, qshift=4,
        qtab=_QTAB_Q4, ptab=_PTAB_STEP, dtab=_DTAB_STEP,
    )
    want = b"".join(quals)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_roundtrip_qtab_only():
    quals = [bytes((i * 7 + j) % 60 for j in range(50)) for i in range(6)]
    blob = fqz_encode(quals, qbits=4, qshift=4, qtab=_QTAB_Q4)
    want = b"".join(quals)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_truncated_stream_raises_not_spins():
    # minimal single-param header + no payload: the range coder reads
    # zeros past end-of-buffer, decoding zero-length records forever
    # without the progress guard
    head = bytearray([5, 0])
    head += struct.pack("<H", 0)
    head += bytes([0, 45, (6 << 4) | 3, (0 << 4) | 15, (15 << 4) | 15])
    with pytest.raises(ValueError, match="progress|length"):
        fqz_decode(bytes(head), 100)


def test_arith_ext_bzip2():
    import bz2

    data = b"quality values, externally compressed" * 4
    blob = bytes([0x04]) + uint7(len(data)) + bz2.compress(data)
    assert arith_decode(blob) == data
    bad = bytes([0x04]) + uint7(len(data) + 1) + bz2.compress(data)
    with pytest.raises(ValueError, match="length mismatch"):
        arith_decode(bad)


# ------------------------------------------------ block-level dispatch


def test_read_block_dispatches_new_methods():
    import zlib

    from oxbow_spark.sources.cram import Cursor, read_block

    def itf8(v):
        assert v < 0x80
        return bytes([v])

    def block(method, data, rsize):
        body = bytes([method, 4]) + itf8(0) + itf8(len(data)) + itf8(rsize) + data
        return body + struct.pack("<I", zlib.crc32(body))

    names = ["r1", "r2"]
    blob = tok3_encode(names)
    want = b"".join(n.encode() + b"\x00" for n in names)
    ctype, cid, raw = read_block(Cursor(block(8, blob, len(want))))
    assert raw == want

    data = b"arith block payload"
    ctype, cid, raw = read_block(Cursor(block(6, arith_encode(data), len(data))))
    assert raw == data

    quals = [bytes([20, 21, 22, 23])]
    fq = fqz_encode(quals)
    ctype, cid, raw = read_block(Cursor(block(7, fq, 4)))
    assert raw == quals[0]


def test_fqz_trailing_empty_records():
    """A valid stream ending with a long run of zero-length quality
    records must decode — the range coder exhausts its input while real
    records are still in flight, so input exhaustion alone is not
    truncation (ADVICE r3)."""
    quals = [bytes([33 + (i + j) % 40 for j in range(20)]) for i in range(5)]
    # a long empty run BEFORE the final record: the decoder must walk
    # through 9+ zero-length records (with the range coder's read-ahead
    # already past the buffer end) to reach the last real record
    quals += [b""] * 32
    quals += [bytes([40 + j % 30 for j in range(15)])]
    blob = fqz_encode(quals)
    want = b"".join(quals)
    assert fqz_decode(blob, len(want)) == want


def fqz_encode_full(recs: list[bytes], param_specs: list[dict],
                    stab: list[int] | None = None,
                    selector: list[int] | None = None,
                    do_rev: list[int] | None = None) -> bytes:
    """Spec-mirroring MULTI-parameter fqzcomp encoder covering every
    remaining decoder branch: GFLAG_MULTI + HAVE_STAB selector tables,
    per-param DO_SEL context mixing, PFLAG_HAVE_QMAP symbol maps,
    FIXED_LEN single-length streams, and GFLAG_DO_REV record reversal.
    ``param_specs`` entries: {qbits, qshift, qmap?, fixed_len?, dedup?,
    do_sel?}; ``selector`` gives the coded selector per record (required
    when len(param_specs) > 1 or any do_sel); ``stab`` maps selector →
    param index; ``do_rev`` per-record reverse bits (enables DO_REV)."""
    from oxbow_spark.sources.cram_codecs import (
        _FQZ_GFLAG_DO_REV,
        _FQZ_GFLAG_HAVE_STAB,
        _FQZ_GFLAG_MULTI,
        _FQZ_PFLAG_DO_DEDUP,
        _FQZ_PFLAG_DO_SEL,
        _FQZ_PFLAG_FIXED_LEN,
        _FQZ_PFLAG_HAVE_QMAP,
    )

    multi = len(param_specs) > 1
    gflags = (_FQZ_GFLAG_MULTI if multi else 0) \
        | (_FQZ_GFLAG_HAVE_STAB if stab is not None else 0) \
        | (_FQZ_GFLAG_DO_REV if do_rev is not None else 0)
    head = bytearray([5, gflags])
    if multi:
        head.append(len(param_specs))
    max_sel = len(param_specs) - 1
    if stab is not None:
        max_sel = len(stab) - 1
        head.append(max_sel)
        head += bytes(stab)
    built = []
    for spec in param_specs:
        qmap = spec.get("qmap")
        pflags = 0
        if qmap is not None:
            pflags |= _FQZ_PFLAG_HAVE_QMAP
        if spec.get("fixed_len"):
            pflags |= _FQZ_PFLAG_FIXED_LEN
        if spec.get("dedup"):
            pflags |= _FQZ_PFLAG_DO_DEDUP
        if spec.get("do_sel"):
            pflags |= _FQZ_PFLAG_DO_SEL
        qbits = spec.get("qbits", 6)
        qshift = spec.get("qshift", 3)
        max_sym = (len(qmap) if qmap is not None
                   else max((max(r) for r in recs if r), default=0) + 1)
        qloc, sloc = 0, 12
        ploc, dloc = 15, 15
        head += struct.pack("<H", spec.get("context", 0))
        head += bytes([pflags, max_sym, (qbits << 4) | qshift,
                       (qloc << 4) | sloc, (ploc << 4) | dloc])
        if qmap is not None:
            head += bytes(qmap)
        inv = ({v: i for i, v in enumerate(qmap)} if qmap is not None
               else None)
        built.append(dict(spec, qbits=qbits, qshift=qshift, qloc=qloc,
                          sloc=sloc, inv=inv, max_sym=max_sym))

    any_sel = max_sel > 0  # mirrors the decoder's max_sel gate
    sel_model = AdaptiveModel(max(max_sel + 1, 1))
    enc = RangeEncoder()
    qmodels: dict[int, AdaptiveModel] = {}
    gmax_sym = max(b["max_sym"] for b in built)

    def qmodel(ctx):
        m = qmodels.get(ctx)
        if m is None:
            m = qmodels[ctx] = AdaptiveModel(gmax_sym)
        return m

    len_models = [AdaptiveModel(256) for _ in range(4)]
    dup_model = AdaptiveModel(2)
    rev_model = AdaptiveModel(2)
    prev = None
    fixed_sent = False
    for ri, q in enumerate(recs):
        sel = selector[ri] if selector is not None else 0
        if any_sel:
            sel_model.encode(enc, sel)
        x = stab[sel] if stab is not None else min(sel, len(built) - 1)
        p = built[x]
        if p.get("fixed_len"):
            if not fixed_sent:
                for i in range(4):
                    len_models[i].encode(enc, (len(q) >> (8 * i)) & 0xFF)
                fixed_sent = True
        else:
            for i in range(4):
                len_models[i].encode(enc, (len(q) >> (8 * i)) & 0xFF)
        r = do_rev[ri] if do_rev is not None else 0
        if do_rev is not None:
            rev_model.encode(enc, r)
        if p.get("dedup") and prev is not None and len(prev) == len(q):
            dup_model.encode(enc, 1 if q == prev else 0)
            if q == prev:
                continue
        if not q:
            prev = b""
            continue
        coded = q[::-1] if r else q  # decoder re-reverses flagged spans
        qctx = 0
        prevq = 0
        delta = 0
        pos = len(coded)
        qmask = (1 << p["qbits"]) - 1
        ctx = p.get("context", 0) & 0xFFFF
        for v in coded:
            sym = p["inv"][v] if p["inv"] is not None else v
            qmodel(ctx).encode(enc, sym)
            qctx = ((qctx << p["qshift"]) + sym) & 0xFFFFFFFF
            ctx = p.get("context", 0)
            ctx += (qctx & qmask) << p["qloc"]
            if prevq != sym:
                delta += 1
            prevq = sym
            if p.get("do_sel"):
                ctx += sel << p["sloc"]
            ctx &= 0xFFFF
        prev = coded
    return bytes(head) + enc.finish()


def test_fqz_multi_param_with_stab_and_sel():
    """Two parameter sets selected per record through an explicit
    selector table, one of them mixing the selector into the context
    (DO_SEL) and using a different context base."""
    recs = [bytes((i * 7 + j) % 40 for j in range(30)) for i in range(12)]
    selector = [i % 3 for i in range(12)]
    blob = fqz_encode_full(
        recs,
        [{"qbits": 6, "qshift": 3, "context": 0},
         {"qbits": 4, "qshift": 4, "do_sel": True, "context": 0x100}],
        stab=[0, 1, 1], selector=selector)
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_qmap():
    """PFLAG_HAVE_QMAP: symbols are indices into an explicit value map
    (binned-quality profiles); decoder must map them back."""
    qmap = [2, 12, 25, 37]
    recs = [bytes(qmap[(i + j) % 4] for j in range(25)) for i in range(8)]
    blob = fqz_encode_full(recs, [{"qbits": 2, "qshift": 2, "qmap": qmap}])
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_fixed_len():
    """FIXED_LEN: one in-stream length applies to every record."""
    recs = [bytes((i + j) % 45 for j in range(64)) for i in range(10)]
    blob = fqz_encode_full(recs, [{"qbits": 5, "qshift": 3,
                                   "fixed_len": True}])
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_do_rev():
    """GFLAG_DO_REV: flagged records are coded reversed and flipped back
    by the decoder after the main pass."""
    recs = [bytes((i * 3 + j) % 40 for j in range(20)) for i in range(9)]
    rev = [i % 2 for i in range(9)]
    blob = fqz_encode_full(recs, [{"qbits": 6, "qshift": 3}], do_rev=rev)
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_multi_dedup_and_empty_records():
    """Dedup inside a multi-param stream plus zero-length records."""
    recs = [b"", bytes([9] * 16), bytes([9] * 16), b"",
            bytes([11] * 16), bytes([11] * 16)]
    selector = [0, 0, 0, 1, 1, 1]
    blob = fqz_encode_full(
        recs,
        [{"qbits": 4, "qshift": 2, "dedup": True},
         {"qbits": 6, "qshift": 3, "dedup": True}],
        stab=[0, 1], selector=selector)
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


# ------------------- htscodecs test-corpus parameter-shape widening
# (round 6): the htscodecs fqzcomp test corpus exercises q4 (NovaSeq
# 4-level binned), q8 (8-level) and q40 (HiSeq full-range) quality
# profiles under varying context shapes. Mirror those shapes through
# the spec-mirroring encoder: each profile × {no tables, DO_POS-style
# ptab, DO_DEL-style dtab, both, both+dedup}. Still not a real
# htscodecs byte stream (none can be produced in this container) — the
# codec keeps its honest 'unvalidated vs real producers' flag.

_FQZ_PROFILES = {
    "q4": dict(vals=[3, 14, 31, 40], qbits=2, qshift=2),
    "q8": dict(vals=[1, 5, 11, 17, 23, 29, 35, 41], qbits=3, qshift=3),
    "q40": dict(vals=list(range(45)), qbits=6, qshift=3),
}
_FQZ_SHAPES = ["plain", "pos", "delta", "pos_delta", "pos_delta_dedup"]


@pytest.mark.parametrize("profile", sorted(_FQZ_PROFILES))
@pytest.mark.parametrize("shape", _FQZ_SHAPES)
def test_fqz_htscodecs_profile_shapes(profile, shape):
    import random

    spec = _FQZ_PROFILES[profile]
    rng = random.Random(sum(map(ord, profile + shape)))
    vals = spec["vals"]
    nlv = len(vals)
    recs = []
    for i in range(24):
        L = 80 if i % 5 else 60  # mixed lengths
        rec = []
        for p in range(L):
            # Illumina-ish positional degradation + jitter + dips
            base = nlv - 1 - (p * nlv) // (L + 40)
            j = base + rng.choice((-1, 0, 0, 0, 1))
            if rng.random() < 0.03:
                j = 0  # quality dip
            rec.append(vals[min(nlv - 1, max(0, j))])
        recs.append(bytes(rec))
    if "dedup" in shape:
        recs = [recs[0]] * 3 + recs + [recs[-1]] * 2
    kw: dict = dict(qbits=spec["qbits"], qshift=spec["qshift"])
    if "pos" in shape:
        kw["ptab"] = _PTAB_STEP
    if "delta" in shape:
        kw["dtab"] = _DTAB_STEP
    if "dedup" in shape:
        kw["do_dedup"] = True
    blob = fqz_encode(recs, **kw)
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


def test_fqz_q4_qmap_profile():
    """q4 with PFLAG_HAVE_QMAP — htscodecs' own q4 shape: 4 mapped
    symbols coded through an explicit value map, FIXED_LEN stream."""
    import random

    rng = random.Random(404)
    vals = [3, 14, 31, 40]
    recs = []
    for i in range(16):
        rec = [vals[min(3, max(0, 3 - (p * 4) // 110
                               + rng.choice((-1, 0, 0, 1))))]
               for p in range(72)]
        recs.append(bytes(rec))
    blob = fqz_encode_full(
        recs, [dict(qbits=2, qshift=2, qmap=vals, fixed_len=True)])
    want = b"".join(recs)
    assert fqz_decode(blob, len(want)) == want


# ------------------------------------------------- round-8 write codecs

@given(st.binary(min_size=1, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_rans4x8_o0_encode_fuzz(data):
    from oxbow_spark.sources.cram import rans4x8_decode
    from oxbow_spark.sources.cram_write import rans4x8_encode

    assert rans4x8_decode(rans4x8_encode(data)) == data


@given(st.binary(min_size=4, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_rans4x8_o1_encode_fuzz(data):
    from oxbow_spark.sources.cram import rans4x8_decode
    from oxbow_spark.sources.cram_write import rans4x8_encode_o1

    assert rans4x8_decode(rans4x8_encode_o1(data)) == data


@given(st.binary(min_size=1, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_rans_nx16_o0_encode_fuzz(data):
    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode

    assert rans_nx16_decode(rans_nx16_encode(data)) == data


@given(st.lists(st.sampled_from([0, 1, 2, 3, 40, 200]),
                min_size=1, max_size=2000))
@settings(max_examples=40, deadline=None)
def test_rans_encoders_skewed_fuzz(vals):
    """Highly-skewed small alphabets (the frequency-normalization
    clamp's hard corner: many present symbols floored to 1)."""
    from oxbow_spark.sources.cram import rans4x8_decode, rans_nx16_decode
    from oxbow_spark.sources.cram_write import (rans4x8_encode,
                                                rans_nx16_encode)

    data = bytes(vals)
    assert rans4x8_decode(rans4x8_encode(data)) == data
    assert rans_nx16_decode(rans_nx16_encode(data)) == data


# ------------------------------------------------- round-9 write codecs

@given(st.binary(min_size=4, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_rans_nx16_o1_encode_fuzz(data):
    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode_o1

    assert rans_nx16_decode(rans_nx16_encode_o1(data)) == data


@given(st.lists(st.sampled_from([0, 1, 2, 3, 40, 200]),
                min_size=4, max_size=2000))
@settings(max_examples=40, deadline=None)
def test_rans_nx16_o1_skewed_fuzz(vals):
    """Skewed small alphabets incl. symbol 0 (which doubles as the
    fragment-start context row)."""
    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode_o1

    data = bytes(vals)
    assert rans_nx16_decode(rans_nx16_encode_o1(data)) == data


@given(st.lists(st.sampled_from(list(b"!#05AFIacgtn~")),
                min_size=1, max_size=2000),
       st.sampled_from([0, 1]))
@settings(max_examples=40, deadline=None)
def test_rans_nx16_pack_encode_fuzz(vals, order):
    """PACK transform (2-16 distinct symbols, 1/2/4-bit codes) with
    either entropy order; hypothesis may shrink to 1 distinct symbol,
    which PACK rejects by contract."""
    import pytest as _pytest

    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode_pack

    data = bytes(vals)
    if len(set(data)) < 2:
        with _pytest.raises(ValueError):
            rans_nx16_encode_pack(data, order=order)
        return
    assert rans_nx16_decode(rans_nx16_encode_pack(data, order=order)) == data


def test_rans_nx16_o1_edges():
    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import (rans_nx16_encode_o1,
                                                rans_nx16_encode_pack)
    import pytest as _pytest

    for d in (b"ABCD", b"\x00\x00\x00\x00", bytes(range(256)) * 2,
              b"Q" * 4096, b"AB" * 3):
        assert rans_nx16_decode(rans_nx16_encode_o1(d)) == d
    with _pytest.raises(ValueError):
        rans_nx16_encode_o1(b"abc")
    with _pytest.raises(ValueError):
        rans_nx16_encode_pack(b"", order=0)
    with _pytest.raises(ValueError):
        rans_nx16_encode_pack(bytes(range(20)) * 2, order=0)  # >16 syms


@given(st.lists(st.tuples(st.sampled_from(list(b"#,:F~")),
                          st.integers(min_value=1, max_value=40)),
                min_size=1, max_size=200),
       st.sampled_from([0, 1]))
@settings(max_examples=40, deadline=None)
def test_rans_nx16_rle_encode_fuzz(run_spec, order):
    """RLE transform (flags 0x40) over run-structured data, both
    entropy orders; degenerate inputs with no qualifying run symbol
    raise by contract."""
    import pytest as _pytest

    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode_rle

    data = b"".join(bytes([s]) * ln for s, ln in run_spec)
    try:
        enc = rans_nx16_encode_rle(data, order=order)
    except ValueError:
        # legal only when no symbol has avg run length > 2
        total = {}
        nrun = {}
        prev = None
        for b in data:
            total[b] = total.get(b, 0) + 1
            if b != prev:
                nrun[b] = nrun.get(b, 0) + 1
            prev = b
        assert not any(total[s] > 2 * nrun[s] for s in total)
        return
    assert rans_nx16_decode(enc) == data


def test_rans_nx16_rle_edges():
    from oxbow_spark.sources.cram import rans_nx16_decode
    from oxbow_spark.sources.cram_write import rans_nx16_encode_rle
    import pytest as _pytest

    for d in (b"AAAA", b"A" * 5000, b"ABAB" * 10 + b"C" * 1000,
              bytes([0]) * 300 + b"xy", b"Q" * 127, b"Q" * 128, b"Q" * 129):
        for order in (0, 1):
            assert rans_nx16_decode(rans_nx16_encode_rle(d, order)) == d
    with _pytest.raises(ValueError):
        rans_nx16_encode_rle(b"")
    with _pytest.raises(ValueError):
        rans_nx16_encode_rle(bytes(range(256)))  # nothing qualifies


# ----------------------------------------------- round-9 tok3 encoder

def test_tok3_production_encoder_roundtrip():
    """The production tok3 encoder (`cram_codecs.tok3_encode`) —
    rANS-compressed token streams, u32/width overflow fallbacks —
    round-trips realistic and adversarial name sets and beats gzip on
    Illumina-style names."""
    import random
    import zlib

    from oxbow_spark.sources.cram_codecs import tok3_decode, tok3_encode

    rng = random.Random(3)
    cases = [
        NAMES,
        ["a"],
        ["x" * 300, "x" * 300, "y"],
        [f"SRR123.{i}" for i in range(5000)],
        [f"m5439{i:09d}/ccs" for i in range(200)],
        ["q18446744073709551616", "q99999999999999999999"],  # > u32
        ["0" * 300 + "1", "0" * 300 + "2"],  # DIGITS0 width > 255
        ["r07", "r08", "r100", "r007"],      # padded/unpadded mix
    ]
    illumina = [
        f"A00228:279:HFFGLDSXY:{rng.randrange(1, 5)}:"
        f"{rng.randrange(1000, 3000)}:{rng.randrange(1000, 30000)}:"
        f"{rng.randrange(1000, 40000)}" for _ in range(3000)]
    cases.append(illumina)
    for names in cases:
        blob = b"".join(n.encode() + b"\x00" for n in names)
        assert tok3_decode(tok3_encode(blob)) == blob
        assert tok3_decode(tok3_encode(names)) == blob
    blob = b"".join(n.encode() + b"\x00" for n in illumina)
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    assert len(tok3_encode(blob)) < len(co.compress(blob) + co.flush())


@given(st.lists(st.from_regex(r"[A-Za-z][A-Za-z0-9:._/-]{0,30}",
                              fullmatch=True), min_size=1, max_size=60))
@settings(max_examples=40, deadline=None)
def test_tok3_production_encoder_fuzz(names):
    from oxbow_spark.sources.cram_codecs import tok3_decode, tok3_encode

    blob = b"".join(n.encode() + b"\x00" for n in names)
    assert tok3_decode(tok3_encode(blob)) == blob


def test_cram_31_rn_series_uses_tok3():
    """Under codec=rans31 the RN series block carries method 8 when
    tok3 wins, and read_block round-trips it."""
    from oxbow_spark.sources.cram import Cursor, read_block
    from oxbow_spark.sources.cram_write import _block

    names = [f"A1:2:FC:3:{i}:{i*7%9999}:{i*13%9999}" for i in range(2000)]
    blob = b"".join(n.encode() + b"\x00" for n in names)
    blk = _block(4, 9, blob, codec="rans31", names=True)
    assert blk[0] == 8, f"expected tok3 (method 8), got {blk[0]}"
    t, cid, raw = read_block(Cursor(blk))
    assert (t, cid, raw) == (4, 9, blob)
    # 3.0 path never emits method 8
    blk30 = _block(4, 9, blob, codec="rans", names=True)
    assert blk30[0] != 8
