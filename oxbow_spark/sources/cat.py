"""`samtools cat`-class BAM part consolidation + BAI index merge.

Distributed writes emit one self-contained part per task (the Spark
norm); delivery often wants ONE file. Because BGZF is a concatenation
of independent gzip members, parts merge by RAW BYTE COPY — no
re-compression, no record decode: keep part 0 up to its EOF marker,
then for every later part skip its (identical) header bytes and copy
its record blocks verbatim, then write one EOF. This repo's BAM writer
block-aligns the header (`align_write.py` flushes after it), so the
skip lands exactly on a block boundary; foreign producers whose header
shares a block with records take a fallback that re-compresses ONLY
that boundary block's record tail.

The `.bai` sidecars merge arithmetically: a raw-copied block keeps its
intra-block layout, so every chunk/linear/metadata virtual offset
shifts by the constant ``(new_block_start − old_block_start) << 16``;
bins concatenate their shifted chunk lists, linear windows take the
elementwise minimum (a valid seek lower bound), metadata pseudo-bins
(idxstats counts + voffset envelopes) and n_no_coor sum. Merged output
is immediately region-queryable and idxstats-readable with NO pass over
the record data — O(total bytes) sequential copy, O(index) merge work.

The reference has no writers at all; this closes the last step of the
write path its users run via `samtools cat` today.
"""

from __future__ import annotations

import struct

from oxbow_spark.sources.align_write import BGZF_EOF, bgzf_compress


def _block_size(hdr: bytes) -> int:
    """Total compressed size of the BGZF block whose first 18+ bytes
    are ``hdr`` — from the BC extra subfield (BGZF spec / SAM §4.1)."""
    if hdr[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip member (corrupt BGZF stream)")
    (xlen,) = struct.unpack_from("<H", hdr, 10)
    off = 12
    end = 12 + xlen
    while off + 4 <= end:
        si1, si2, slen = hdr[off], hdr[off + 1], struct.unpack_from(
            "<H", hdr, off + 2)[0]
        if si1 == 66 and si2 == 67:  # 'B','C'
            (bsize,) = struct.unpack_from("<H", hdr, off + 4)
            return bsize + 1
        off += 4 + slen
    raise ValueError("BGZF BC subfield missing (plain gzip, not BGZF)")


def _blocks(data: bytes):
    """Yield (offset, size, isize) for each BGZF block in ``data``
    (isize = uncompressed payload length, from the gzip trailer)."""
    off = 0
    n = len(data)
    while off < n:
        size = _block_size(data[off:off + 64])
        (isize,) = struct.unpack_from("<I", data, off + size - 4)
        yield off, size, isize
        off += size


def _bam_header_len(path: str) -> tuple[int, bytes]:
    """(uncompressed byte length of the BAM header section, its bytes):
    magic + l_text + text + n_ref + per-ref (l_name + name + l_ref)."""
    import zlib

    buf = bytearray()
    need = 12
    with open(path, "rb") as f:
        while len(buf) < need:
            hdr = f.read(18)
            if len(hdr) < 18:
                raise ValueError(f"{path}: truncated BAM")
            size = _block_size(hdr)
            rest = f.read(size - 18)
            buf += zlib.decompress(hdr + rest, 31)
            if len(buf) >= 12:
                if buf[:4] != b"BAM\x01":
                    raise ValueError(f"{path} is not BAM")
                (l_text,) = struct.unpack_from("<i", buf, 4)
                if len(buf) >= 8 + l_text + 4:
                    (n_ref,) = struct.unpack_from("<i", buf, 8 + l_text)
                    off = 12 + l_text
                    ok = True
                    for _ in range(n_ref):
                        if len(buf) < off + 4:
                            ok = False
                            break
                        (l_name,) = struct.unpack_from("<i", buf, off)
                        off += 4 + l_name + 4
                    if ok and len(buf) >= off:
                        return off, bytes(buf[:off])
                    need = off
                else:
                    need = 8 + l_text + 4
    raise ValueError(f"{path}: truncated BAM header")


def _split_part(path: str) -> tuple[bytes, int, int, bool, bytes]:
    """(header_bytes, record_start, record_end, clean, boundary_tail):
    byte offsets of the record-block region in the part file (EOF
    marker excluded). ``clean`` means the header ended exactly on a
    block boundary (raw copy preserves every virtual offset);
    otherwise ``boundary_tail`` holds the re-compressed record bytes of
    the header-straddling block."""
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    h_len, h_bytes = _bam_header_len(path)
    end = len(data)
    while end >= 28 and data[end - 28:end] == BGZF_EOF:
        end -= 28
    cum = 0
    for off, size, isize in _blocks(data[:end]):
        if cum == h_len:
            return h_bytes, off, end, True, b""
        if cum + isize > h_len:
            # header ends inside this block: re-compress its tail
            raw = zlib.decompress(data[off:off + size], 31)
            tail = raw[h_len - cum:]
            return (h_bytes, off + size, end, False,
                    bgzf_compress(tail) if tail else b"")
        cum += isize
    if cum == h_len:  # header-only part (no records)
        return h_bytes, end, end, True, b""
    raise ValueError(f"{path}: header extends past the data blocks")


def cat_bam(parts: list[str], out: str,
            index: str | None = None) -> dict:
    """Concatenate BAM ``parts`` (identical headers required, like
    `samtools cat`) into ``out`` by raw block copy. ``index='bai'``
    additionally merges the parts' ``.bai`` sidecars into ``out +
    '.bai'`` — requires every part to be clean (header block-aligned,
    true for this repo's writer) with a sidecar present. Returns
    {'parts': n, 'bytes': total, 'clean': all_clean}."""
    if not parts:
        raise ValueError("cat_bam: no parts")
    infos = [_split_part(p) for p in parts]
    h0 = infos[0][0]
    for p, (h, *_rest) in zip(parts[1:], infos[1:]):
        if h != h0:
            raise ValueError(
                f"{p}: header differs from {parts[0]} — cat requires "
                "identical headers (same @SQ dictionary and text)")
    all_clean = all(i[3] for i in infos)
    if index is not None:
        if index != "bai":
            raise ValueError("cat_bam index must be 'bai' (or None)")
        if not all_clean:
            raise ValueError(
                "index merge needs header-block-aligned parts (this "
                "repo's writer); re-index the merged file instead")
        missing = [p for p in parts if not _exists(p + ".bai")]
        if missing:
            raise ValueError(f"missing .bai sidecars: {missing}")

    deltas: list[int] = []
    total = 0
    with open(out, "wb") as fo:
        first = True
        for p, (_h, rs, re_, _clean, tail) in zip(parts, infos):
            with open(p, "rb") as fi:
                if first:
                    # part 0 copies from byte 0: offsets unchanged
                    deltas.append(0)
                    data = fi.read(re_)
                    fo.write(data)
                    total += len(data)
                    first = False
                    continue
                if tail:
                    fo.write(tail)
                    total += len(tail)
                deltas.append(total - rs)
                fi.seek(rs)
                data = fi.read(re_ - rs)
                fo.write(data)
                total += len(data)
        fo.write(BGZF_EOF)
        total += len(BGZF_EOF)
    if index == "bai":
        _merge_bai([p + ".bai" for p in parts], deltas, out + ".bai")
    return {"parts": len(parts), "bytes": total, "clean": all_clean}


def _exists(path: str) -> bool:
    import os

    return os.path.exists(path)


def _shift(v: int, delta: int) -> int:
    """Shift a virtual offset's compressed-block component; 0 entries
    (unset linear windows) stay 0."""
    return ((((v >> 16) + delta) << 16) | (v & 0xFFFF)) if v else 0


def _merge_bai(bai_paths: list[str], deltas: list[int],
               out_path: str) -> None:
    from oxbow_spark.sources.bgzf import BaiIndex

    idxs = [BaiIndex.read(p) for p in bai_paths]
    n_ref = len(idxs[0].refs)
    if any(len(i.refs) != n_ref for i in idxs):
        raise ValueError("BAI ref counts differ (headers should match)")

    out = [b"BAI\x01", struct.pack("<i", n_ref)]
    for r in range(n_ref):
        bins: dict[int, list[tuple[int, int]]] = {}
        meta = None  # [vlo, vhi, mapped, unmapped]
        linear: list[int] = []
        for idx, d in zip(idxs, deltas):
            ref = idx.refs[r]
            for b, chunks in ref.bins.items():
                if b == 37450:
                    (vlo, vhi), (mp, un) = chunks
                    vlo, vhi = _shift(vlo, d), _shift(vhi, d)
                    if meta is None:
                        meta = [vlo, vhi, mp, un]
                    else:
                        meta[0] = min(meta[0], vlo) if vlo else meta[0]
                        meta[1] = max(meta[1], vhi)
                        meta[2] += mp
                        meta[3] += un
                    continue
                dst = bins.setdefault(b, [])
                dst.extend((_shift(s, d), _shift(e, d)) for s, e in chunks)
            li = ref.intervals or []
            if len(li) > len(linear):
                linear.extend([0] * (len(li) - len(linear)))
            for w, v in enumerate(li):
                sv = _shift(v, d)
                if sv and (linear[w] == 0 or sv < linear[w]):
                    linear[w] = sv
        out.append(struct.pack(
            "<i", len(bins) + (1 if meta is not None else 0)))
        for b in sorted(bins):
            chunks = bins[b]
            out.append(struct.pack("<iI", b, len(chunks)))
            for s, e in chunks:
                out.append(struct.pack("<QQ", s, e))
        if meta is not None:
            out.append(struct.pack("<iI", 37450, 2))
            out.append(struct.pack("<QQ", meta[0], meta[1]))
            out.append(struct.pack("<QQ", meta[2], meta[3]))
        out.append(struct.pack("<i", len(linear)))
        for v in linear:
            out.append(struct.pack("<Q", v))
    out.append(struct.pack(
        "<Q", sum(i.n_no_coor or 0 for i in idxs)))
    with open(out_path, "wb") as f:
        f.write(b"".join(out))
