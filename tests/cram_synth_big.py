"""Large synthetic CRAM builder for throughput work: n mapped records on
one reference with a realistic feature mix (substitutions, soft clips,
deletions, insertions), qualities and read names on, all per-record
series external-coded (the htslib layout). Raw (method 0) blocks — the
point is record-assembly throughput, not entropy codecs."""

from __future__ import annotations

import struct
import zlib

from tests.test_cram_synthetic import CIDS, block, external, itf8, ltf8, stop_enc

BIG_CIDS = {**CIDS, "BS": 17, "DL": 18, "IN": 19}


def build_big_cram(n: int = 20000, read_len: int = 100,
                   recs_per_slice: int = 10000) -> bytes:
    sam_text = "@SQ\tSN:chr1\tLN:100000000\n"
    raw = struct.pack("<i", len(sam_text)) + sam_text.encode()
    fh_hdr = (itf8(0) + itf8(0) + itf8(0) + itf8(0) + ltf8(0) + ltf8(0)
              + itf8(1) + itf8(1) + itf8(0))
    fh_hdr += struct.pack("<I", zlib.crc32(fh_hdr))
    fhb = block(0, 0, raw)
    fh = struct.pack("<i", len(fhb)) + fh_hdr + fhb

    def container(ref_id, start, span, nrec, blocks):
        body = b"".join(blocks)
        hdr = (itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec)
               + ltf8(0) + ltf8(0) + itf8(len(blocks)) + itf8(1) + itf8(0))
        hdr += struct.pack("<I", zlib.crc32(hdr))
        return struct.pack("<i", len(body)) + hdr + body

    out = [b"CRAM\x03\x00" + bytes(20), fh]
    pres = (b"RN" + b"\x01" + b"AP" + b"\x01" + b"RR" + b"\x00"
            + b"SM" + bytes(5) + b"TD" + itf8(1) + b"\x00")
    pres_body = itf8(5) + pres
    pres_map = itf8(len(pres_body)) + pres_body
    entries = []
    for key in ("BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN",
                "FC", "FP", "BS", "DL", "MQ", "QS", "BA"):
        entries.append(key.encode() + external(BIG_CIDS[key]))
    entries.append(b"RN" + stop_enc(BIG_CIDS["RN"]))
    entries.append(b"SC" + stop_enc(BIG_CIDS["SC"]))
    entries.append(b"IN" + stop_enc(BIG_CIDS["IN"]))
    ser_body = itf8(len(entries)) + b"".join(entries)
    ser_map = itf8(len(ser_body)) + ser_body
    tag_map = itf8(len(itf8(0))) + itf8(0)
    comp_raw = pres_map + ser_map + tag_map

    done = 0
    while done < n:
        m = min(recs_per_slice, n - done)
        streams: dict[str, bytearray] = {k: bytearray() for k in
            ("BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN", "FC", "FP",
             "BS", "DL", "MQ", "QS", "BA", "RN", "SC", "IN")}
        start_pos = 1000 + done * 5
        for i in range(done, done + m):
            streams["BF"] += itf8(0)
            streams["CF"] += itf8(1)        # qualities stored
            streams["RL"] += itf8(read_len)
            streams["AP"] += itf8(5 if i > done else 0)
            streams["RG"] += itf8(-1)
            streams["RN"] += f"read{i}\x00".encode()
            streams["TL"] += itf8(0)
            kind = i % 4
            if kind == 0:          # perfect match
                streams["FN"] += itf8(0)
            elif kind == 1:        # two substitutions
                streams["FN"] += itf8(2)
                streams["FC"] += b"XX"
                streams["FP"] += itf8(10) + itf8(30)
                streams["BS"] += itf8(1) + itf8(2)
            elif kind == 2:        # leading soft clip + deletion
                streams["FN"] += itf8(2)
                streams["FC"] += b"SD"
                streams["FP"] += itf8(1) + itf8(40)
                streams["SC"] += b"ACGTA\x00"
                streams["DL"] += itf8(3)
            else:                  # insertion
                streams["FN"] += itf8(1)
                streams["FC"] += b"I"
                streams["FP"] += itf8(20)
                streams["IN"] += b"TTG\x00"
            streams["MQ"] += itf8(37)
            streams["QS"] += bytes((33 + (i + j) % 40) for j in range(read_len))
        comp = block(1, 0, comp_raw)
        ext_keys = [k for k, v in streams.items() if len(v)]
        ext_blocks = [block(4, BIG_CIDS[k], bytes(streams[k]))
                      for k in ext_keys]
        ids = [BIG_CIDS[k] for k in ext_keys]
        span = m * 5 + read_len
        sl = (itf8(0) + itf8(start_pos) + itf8(span) + itf8(m) + ltf8(0)
              + itf8(len(ext_blocks)) + itf8(len(ids))
              + b"".join(itf8(i) for i in ids) + itf8(-1) + bytes(16))
        slice_hdr = block(2, 0, sl)
        out.append(container(0, start_pos, span, m, [comp, slice_hdr] + ext_blocks))
        done += m

    eof_blk = block(1, 0, itf8(0) * 3)
    out.append(container(-1, 4542278, 0, 0, [eof_blk]))
    return b"".join(out)


def build_longread_cram(n: int = 2000, read_len: int = 5000,
                        n_subs: int = 40, recs_per_slice: int = 1000) -> bytes:
    """Long-read profile: every record carries ``n_subs`` substitution
    features plus a soft clip, an insertion and a deletion — the
    PacBio/ONT-shaped workload where per-feature Python dominates record
    assembly and the vectorized path pays off."""
    sam_text = "@SQ\tSN:chr1\tLN:100000000\n"
    raw = struct.pack("<i", len(sam_text)) + sam_text.encode()
    fh_hdr = (itf8(0) + itf8(0) + itf8(0) + itf8(0) + ltf8(0) + ltf8(0)
              + itf8(1) + itf8(1) + itf8(0))
    fh_hdr += struct.pack("<I", zlib.crc32(fh_hdr))
    fhb = block(0, 0, raw)
    fh = struct.pack("<i", len(fhb)) + fh_hdr + fhb

    def container(ref_id, start, span, nrec, blocks):
        body = b"".join(blocks)
        hdr = (itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec)
               + ltf8(0) + ltf8(0) + itf8(len(blocks)) + itf8(1) + itf8(0))
        hdr += struct.pack("<I", zlib.crc32(hdr))
        return struct.pack("<i", len(body)) + hdr + body

    out = [b"CRAM\x03\x00" + bytes(20), fh]
    pres = (b"RN" + b"\x01" + b"AP" + b"\x01" + b"RR" + b"\x00"
            + b"SM" + bytes(5) + b"TD" + itf8(1) + b"\x00")
    pres_body = itf8(5) + pres
    pres_map = itf8(len(pres_body)) + pres_body
    entries = []
    for key in ("BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN",
                "FC", "FP", "BS", "DL", "MQ", "QS", "BA"):
        entries.append(key.encode() + external(BIG_CIDS[key]))
    entries.append(b"RN" + stop_enc(BIG_CIDS["RN"]))
    entries.append(b"SC" + stop_enc(BIG_CIDS["SC"]))
    entries.append(b"IN" + stop_enc(BIG_CIDS["IN"]))
    ser_body = itf8(len(entries)) + b"".join(entries)
    ser_map = itf8(len(ser_body)) + ser_body
    tag_map = itf8(len(itf8(0))) + itf8(0)
    comp_raw = pres_map + ser_map + tag_map

    gap = read_len // (n_subs + 4)
    done = 0
    while done < n:
        m = min(recs_per_slice, n - done)
        streams: dict[str, bytearray] = {k: bytearray() for k in
            ("BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN", "FC", "FP",
             "BS", "DL", "MQ", "QS", "BA", "RN", "SC", "IN")}
        start_pos = 1000 + done * 50
        for i in range(done, done + m):
            streams["BF"] += itf8(0)
            streams["CF"] += itf8(1)
            streams["RL"] += itf8(read_len)
            streams["AP"] += itf8(50 if i > done else 0)
            streams["RG"] += itf8(-1)
            streams["RN"] += f"lr{i}\x00".encode()
            streams["TL"] += itf8(0)
            nf = n_subs + 3
            streams["FN"] += itf8(nf)
            streams["FC"] += b"S"
            streams["FP"] += itf8(1)
            streams["SC"] += b"ACGTACGT\x00"
            fpos = 9
            for j in range(n_subs):
                streams["FC"] += b"X"
                streams["FP"] += itf8(gap)
                fpos += gap
                streams["BS"] += itf8((i + j) % 4)
            streams["FC"] += b"I"
            streams["FP"] += itf8(5)
            streams["IN"] += b"TTGCA\x00"
            streams["FC"] += b"D"
            streams["FP"] += itf8(7)
            streams["DL"] += itf8(12)
            streams["MQ"] += itf8(50)
            streams["QS"] += bytes((33 + (i + j) % 40)
                                   for j in range(read_len))
        comp = block(1, 0, comp_raw)
        ext_keys = [k for k, v in streams.items() if len(v)]
        ext_blocks = [block(4, BIG_CIDS[k], bytes(streams[k]))
                      for k in ext_keys]
        ids = [BIG_CIDS[k] for k in ext_keys]
        span = m * 50 + read_len + 100
        sl = (itf8(0) + itf8(start_pos) + itf8(span) + itf8(m) + ltf8(0)
              + itf8(len(ext_blocks)) + itf8(len(ids))
              + b"".join(itf8(i) for i in ids) + itf8(-1) + bytes(16))
        slice_hdr = block(2, 0, sl)
        out.append(container(0, start_pos, span, m, [comp, slice_hdr] + ext_blocks))
        done += m

    eof_blk = block(1, 0, itf8(0) * 3)
    out.append(container(-1, 4542278, 0, 0, [eof_blk]))
    return b"".join(out)


FUZZ_CIDS = {**BIG_CIDS, "MF": 20, "NS": 21, "NP": 22, "TS": 23,
             "NF": 24, "RS": 25, "HC": 26, "PD": 27, "BB": 28}


def build_fuzz_cram(seed: int, n: int = 800,
                    recs_per_slice: int = 400) -> bytes:
    """Randomized CRAM exercising EVERY read-feature type (X i I S D N
    H P B Q b), detached mates, NF mate chains, unmapped records with
    and without BA-slab sequences, seq-absent (CF&0x8) records and
    absent-quality records — the adversarial corpus for the vectorized
    assembler and the Arrow emit path (which must equal the per-record
    loop byte for byte or bail)."""
    import random

    rng = random.Random(seed)
    sam_text = "@SQ\tSN:chr1\tLN:100000000\n"
    raw = struct.pack("<i", len(sam_text)) + sam_text.encode()
    fh_hdr = (itf8(0) + itf8(0) + itf8(0) + itf8(0) + ltf8(0) + ltf8(0)
              + itf8(1) + itf8(1) + itf8(0))
    fh_hdr += struct.pack("<I", zlib.crc32(fh_hdr))
    fhb = block(0, 0, raw)
    fh = struct.pack("<i", len(fhb)) + fh_hdr + fhb

    def container(ref_id, start, span, nrec, blocks):
        body = b"".join(blocks)
        hdr = (itf8(ref_id) + itf8(start) + itf8(span) + itf8(nrec)
               + ltf8(0) + ltf8(0) + itf8(len(blocks)) + itf8(1) + itf8(0))
        hdr += struct.pack("<I", zlib.crc32(hdr))
        return struct.pack("<i", len(body)) + hdr + body

    out = [b"CRAM\x03\x00" + bytes(20), fh]
    pres = (b"RN" + b"\x01" + b"AP" + b"\x01" + b"RR" + b"\x00"
            + b"SM" + bytes(5) + b"TD" + itf8(1) + b"\x00")
    pres_body = itf8(5) + pres
    pres_map = itf8(len(pres_body)) + pres_body
    entries = []
    for key in ("BF", "CF", "RI", "RL", "AP", "RG", "TL", "FN",
                "FC", "FP", "BS", "DL", "MQ", "QS", "BA",
                "MF", "NS", "NP", "TS", "NF", "RS", "HC", "PD"):
        entries.append(key.encode() + external(FUZZ_CIDS[key]))
    for key in ("RN", "SC", "IN", "BB"):
        entries.append(key.encode() + stop_enc(FUZZ_CIDS[key]))
    ser_body = itf8(len(entries)) + b"".join(entries)
    ser_map = itf8(len(ser_body)) + ser_body
    tag_map = itf8(len(itf8(0))) + itf8(0)
    comp_raw = pres_map + ser_map + tag_map

    done = 0
    while done < n:
        m = min(recs_per_slice, n - done)
        streams: dict[str, bytearray] = {
            k: bytearray() for k in FUZZ_CIDS}
        start_pos = 1000 + done * 20
        i = done
        end = done + m
        while i < end:
            # occasionally an adjacent NF mate pair (both mapped)
            pair = i + 1 < end and rng.random() < 0.15
            for which in range(2 if pair else 1):
                unmapped = not pair and rng.random() < 0.12
                seq_absent = rng.random() < 0.1
                has_qual = rng.random() < 0.8
                detached = not pair and not unmapped and rng.random() < 0.2
                rl = rng.randrange(0, 60)
                bf = 0x4 if unmapped else 0
                cf = (0x1 if has_qual else 0) | (0x8 if seq_absent else 0)
                if pair:
                    cf |= 0x4 if which == 0 else 0x2
                elif detached:
                    cf |= 0x2
                streams["BF"] += itf8(bf)
                streams["CF"] += itf8(cf)
                streams["RL"] += itf8(rl)
                streams["AP"] += itf8(20 if i > done else 0)
                streams["RG"] += itf8(-1)
                streams["RN"] += f"fz{i}\x00".encode()
                streams["TL"] += itf8(0)
                if pair and which == 0:
                    streams["NF"] += itf8(0)  # mate is the next record
                if (pair and which == 1) or detached:
                    streams["MF"] += itf8(rng.randrange(0, 4))
                    ns = rng.choice([-1, 0])
                    streams["NS"] += itf8(ns)
                    streams["NP"] += itf8(rng.randrange(1, 5000))
                    streams["TS"] += itf8(rng.randrange(-300, 300))
                feat_qs = bytearray()
                if unmapped:
                    pass  # no features for unmapped
                else:
                    feats = []
                    pos = 1
                    while pos <= rl:
                        op = rng.choice("XXXiIBSDNHPQb.")
                        if op == ".":  # leave a plain match gap
                            pos += rng.randrange(1, 6)
                            continue
                        if op == "X":
                            feats.append(("X", pos))
                            streams["BS"] += itf8(rng.randrange(0, 4))
                            pos += 1
                        elif op == "i":
                            feats.append(("i", pos))
                            streams["BA"] += bytes(
                                [rng.choice(b"ACGT")])
                            pos += 1
                        elif op == "B":
                            feats.append(("B", pos))
                            streams["BA"] += bytes([rng.choice(b"ACGT")])
                            feat_qs += bytes([rng.randrange(33, 70)])
                            pos += 1
                        elif op == "Q":
                            feats.append(("Q", pos))
                            feat_qs += bytes([rng.randrange(33, 70)])
                            # Q consumes no read bases
                        elif op == "I":
                            ln = rng.randrange(1, 5)
                            if pos + ln > rl + 1:
                                continue
                            feats.append(("I", pos))
                            streams["IN"] += bytes(
                                rng.choice(b"ACGT") for _ in range(ln)
                            ) + b"\x00"
                            pos += ln
                        elif op == "S":
                            ln = rng.randrange(1, 5)
                            if pos + ln > rl + 1:
                                continue
                            feats.append(("S", pos))
                            streams["SC"] += bytes(
                                rng.choice(b"ACGT") for _ in range(ln)
                            ) + b"\x00"
                            pos += ln
                        elif op == "b":
                            ln = rng.randrange(1, 5)
                            if pos + ln > rl + 1:
                                continue
                            feats.append(("b", pos))
                            streams["BB"] += bytes(
                                rng.choice(b"ACGT") for _ in range(ln)
                            ) + b"\x00"
                            pos += ln
                        elif op == "D":
                            feats.append(("D", pos))
                            streams["DL"] += itf8(rng.randrange(1, 8))
                        elif op == "N":
                            feats.append(("N", pos))
                            streams["RS"] += itf8(rng.randrange(1, 50))
                        elif op == "H":
                            feats.append(("H", pos))
                            streams["HC"] += itf8(rng.randrange(1, 9))
                        elif op == "P":
                            feats.append(("P", pos))
                            streams["PD"] += itf8(rng.randrange(1, 4))
                    streams["FN"] += itf8(len(feats))
                    prev = 0
                    for fc, fp in feats:
                        streams["FC"] += fc.encode()
                        streams["FP"] += itf8(fp - prev)
                        prev = fp
                    streams["MQ"] += itf8(rng.randrange(0, 61))
                if unmapped and not seq_absent:
                    streams["BA"] += bytes(
                        rng.choice(b"ACGT") for _ in range(rl))
                streams["QS"] += feat_qs
                if has_qual:
                    if rng.random() < 0.1:
                        streams["QS"] += b"\xff" * rl  # quals "absent"
                    else:
                        streams["QS"] += bytes(
                            rng.randrange(33, 70) for _ in range(rl))
                i += 1
        comp = block(1, 0, comp_raw)
        ext_keys = [k for k, v in streams.items() if len(v)]
        ext_blocks = [block(4, FUZZ_CIDS[k], bytes(streams[k]))
                      for k in ext_keys]
        ids = [FUZZ_CIDS[k] for k in ext_keys]
        span = m * 20 + 200
        sl = (itf8(0) + itf8(start_pos) + itf8(span) + itf8(m) + ltf8(0)
              + itf8(len(ext_blocks)) + itf8(len(ids))
              + b"".join(itf8(x) for x in ids) + itf8(-1) + bytes(16))
        slice_hdr = block(2, 0, sl)
        out.append(container(0, start_pos, span, m,
                             [comp, slice_hdr] + ext_blocks))
        done += m

    eof_blk = block(1, 0, itf8(0) * 3)
    out.append(container(-1, 4542278, 0, 0, [eof_blk]))
    return b"".join(out)
