"""rANS Nx16 (CRAM 3.1) decoder round-trips: a minimal test-side encoder
produces every flag combination — order-0/1, X32, RLE, PACK, CAT, STRIPE,
compressed tables/metadata — and the decoder must invert it exactly."""

from __future__ import annotations

import struct

import pytest

from oxbow_spark.sources.cram import rans_nx16_decode

L16 = 1 << 15  # rANS state lower bound for 16-bit renormalization


def uint7(v: int) -> bytes:
    out = bytearray([v & 0x7F])
    v >>= 7
    while v:
        out.insert(0, 0x80 | (v & 0x7F))
        v >>= 7
    return bytes(out)


def enc_alphabet(present: list[int]) -> bytes:
    out = bytearray()
    last = None
    for s in present:
        out.append(s)
        if last is not None and s == last + 1:
            out.append(0)  # explicit zero run byte
        last = s
    out.append(0)
    return bytes(out)


def _norm(counts: dict[int, int], bits: int) -> dict[int, int]:
    M = 1 << bits
    tot = sum(counts.values())
    present = sorted(counts)
    freq = {}
    acc = 0
    for s in present:
        freq[s] = max(1, (counts[s] * M) // tot)
        acc += freq[s]
    freq[present[0]] += M - acc
    return freq


def _rans_encode_stream(emit_plan: list[tuple[int, int, int, int]], n_states: int,
                        bits: int) -> bytes:
    """Encode (state, sym_freq, sym_cum) steps in reverse decode order.
    emit_plan entries: (state_index, freq, cum, _) in DECODE order."""
    R = [L16] * n_states
    words: list[int] = []
    for j, f, cm, _s in reversed(emit_plan):
        x = R[j]
        x_max = ((1 << 31) >> bits) * f
        while x >= x_max:
            words.append(x & 0xFFFF)
            x >>= 16
        R[j] = ((x // f) << bits) + (x % f) + cm
    head = b"".join(struct.pack("<I", R[j]) for j in range(n_states))
    return head + b"".join(struct.pack("<H", w) for w in reversed(words))


def entropy0_encode(data: bytes, n_states: int = 4) -> bytes:
    counts: dict[int, int] = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    freq = _norm(counts, 12)
    present = sorted(freq)
    cum = {}
    acc = 0
    for s in present:
        cum[s] = acc
        acc += freq[s]
    tbl = enc_alphabet(present) + b"".join(uint7(freq[s]) for s in present)
    plan = [(i & (n_states - 1), freq[data[i]], cum[data[i]], data[i])
            for i in range(len(data))]
    return tbl + _rans_encode_stream(plan, n_states, 12)


def entropy1_encode(data: bytes, n_states: int = 4, shift: int = 12,
                    compress_table: bool = False) -> bytes:
    n = len(data)
    q = n // n_states
    frag = [(j * q, (j + 1) * q if j < n_states - 1 else n)
            for j in range(n_states)]
    counts: dict[int, dict[int, int]] = {}
    for start, end in frag:
        ctx = 0
        for i in range(start, end):
            counts.setdefault(ctx, {})[data[i]] = (
                counts.setdefault(ctx, {}).get(data[i], 0) + 1
            )
            ctx = data[i]
    present = sorted(set(data) | {0})
    freq: dict[int, dict[int, int]] = {}
    cum: dict[int, dict[int, int]] = {}
    rows = bytearray()
    for i in present:
        row = counts.get(i, {})
        if row:
            f = _norm(row, shift)
            freq[i] = {s: f.get(s, 0) for s in present}
            acc = 0
            cum[i] = {}
            for s in present:
                cum[i][s] = acc
                acc += freq[i].get(s, 0)
        rows += b"".join(uint7(freq[i][s] if row else 0) for s in present) if row \
            else b"".join(uint7(0) for _ in present)
    tbl = enc_alphabet(present) + bytes(rows)
    comp = (shift << 4) | (1 if compress_table else 0)
    if compress_table:
        ctbl = entropy0_encode(tbl, 4)
        head = bytes([comp]) + uint7(len(tbl)) + uint7(len(ctbl)) + ctbl
    else:
        head = bytes([comp]) + tbl
    # decode order: rounds over states, then the last state's remainder
    plan = []
    ctxs = [0] * n_states
    for k in range(q):
        for j in range(n_states):
            pos = j * q + k
            s = data[pos]
            plan.append((j, freq[ctxs[j]][s], cum[ctxs[j]][s], s))
            ctxs[j] = s
    j = n_states - 1
    for pos in range(n_states * q, n):
        s = data[pos]
        plan.append((j, freq[ctxs[j]][s], cum[ctxs[j]][s], s))
        ctxs[j] = s
    return head + _rans_encode_stream(plan, n_states, shift)


def rle_split(data: bytes, rle_syms: list[int]) -> tuple[bytes, bytes]:
    """(literal stream, metadata): symbols in rle_syms store one literal
    plus an extra-repeat count in the metadata stream."""
    meta = bytearray([len(rle_syms) % 256]) + bytes(rle_syms)
    rset = set(rle_syms)
    lits = bytearray()
    runs = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        lits.append(b)
        if b in rset:
            run = 0
            while i + 1 + run < len(data) and data[i + 1 + run] == b:
                run += 1
            runs += uint7(run)
            i += 1 + run
        else:
            i += 1
    return bytes(lits), bytes(meta + runs)


def nx16_encode(data: bytes, order: int = 0, n32: bool = False,
                rle: list[int] | None = None, compress_rle_meta: bool = False,
                compress_table: bool = False, shift: int = 12) -> bytes:
    flags = order | (0x04 if n32 else 0) | (0x40 if rle is not None else 0)
    n_states = 32 if n32 else 4
    out = bytearray([flags]) + uint7(len(data))
    stage = data
    if rle is not None:
        stage, meta = rle_split(data, rle)
        if compress_rle_meta:
            cmeta = entropy0_encode(meta, 4)
            out += uint7(len(meta) << 1) + uint7(len(stage)) + uint7(len(cmeta)) + cmeta
        else:
            out += uint7((len(meta) << 1) | 1) + uint7(len(stage)) + meta
    if order:
        out += entropy1_encode(stage, n_states, shift, compress_table)
    else:
        out += entropy0_encode(stage, n_states)
    return bytes(out)


def stripe_encode(data: bytes, n_streams: int = 4, order: int = 0) -> bytes:
    out = bytearray([0x08]) + uint7(len(data))
    subs = [data[j::n_streams] for j in range(n_streams)]
    encs = []
    for s in subs:
        inner = bytearray([0x10 | order])  # NOSZ substreams
        inner += (entropy1_encode(s) if order else entropy0_encode(s))
        encs.append(bytes(inner))
    out += bytes([n_streams]) + b"".join(uint7(len(e)) for e in encs)
    out += b"".join(encs)
    return bytes(out)


PAYLOADS = [
    b"hello hello hello rANS rANS rANS " * 40,
    bytes(range(97, 105)) * 513,  # length not divisible by 4 after *513? 8*513=4104
    b"mississippi riverbank " * 123 + b"xyz",  # remainder exercises last state
    bytes([7]) * 2000,
]


@pytest.mark.parametrize("data", PAYLOADS)
def test_nx16_order0_roundtrip(data):
    assert rans_nx16_decode(nx16_encode(data, order=0)) == data


@pytest.mark.parametrize("data", PAYLOADS)
def test_nx16_order1_roundtrip(data):
    assert rans_nx16_decode(nx16_encode(data, order=1)) == data


@pytest.mark.parametrize("data", PAYLOADS)
def test_nx16_order1_compressed_table(data):
    blob = nx16_encode(data, order=1, compress_table=True)
    assert rans_nx16_decode(blob) == data


def test_nx16_order1_shift10():
    data = b"abcabcabc banana banana " * 100
    assert rans_nx16_decode(nx16_encode(data, order=1, shift=10)) == data


@pytest.mark.parametrize("order", [0, 1])
def test_nx16_x32_roundtrip(order):
    data = b"The quick brown fox jumps over the lazy dog. " * 64
    blob = nx16_encode(data, order=order, n32=True)
    assert rans_nx16_decode(blob) == data


def test_nx16_rle_roundtrip():
    data = b"aaaaaabbbbbbccccccc" * 97 + b"aaaaAAAA"
    blob = nx16_encode(data, rle=[ord("a"), ord("b"), ord("c")])
    assert rans_nx16_decode(blob) == data


def test_nx16_rle_compressed_meta():
    data = (b"x" * 50 + b"y" * 30 + b"z") * 40
    blob = nx16_encode(data, rle=[ord("x"), ord("y")], compress_rle_meta=True)
    assert rans_nx16_decode(blob) == data


def test_nx16_rle_order1():
    data = (b"runs: " + b"G" * 70 + b"T" * 35) * 60
    blob = nx16_encode(data, order=1, rle=[ord("G"), ord("T")])
    assert rans_nx16_decode(blob) == data


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n_streams", [2, 4])
def test_nx16_stripe_roundtrip(order, n_streams):
    # quality-string-like data: stripe transposes interleaved byte planes
    data = bytes((i * 7 + lane) % 64 + 33
                 for i in range(800) for lane in range(4))
    blob = stripe_encode(data, n_streams=n_streams, order=order)
    assert rans_nx16_decode(blob) == data


def test_nx16_stripe_uneven_tail():
    data = b"ABCDE" * 199 + b"XY"  # n % n_streams != 0
    assert rans_nx16_decode(stripe_encode(data, n_streams=4)) == data
