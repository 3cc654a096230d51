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
                    # ok=False means the ref scan stopped mid-entry with
                    # off possibly <= len(buf) (the l_name int itself is
                    # split across blocks); demand at least 4 more bytes
                    # so the loop reads the next block and re-parses
                    need = off if ok else max(off + 4, len(buf) + 1)
                else:
                    need = 8 + l_text + 4
    raise ValueError(f"{path}: truncated BAM header")


def _text_header_len(path: str, meta_prefix: str = "#") -> tuple[int, bytes]:
    """(uncompressed byte length, bytes) of a bgzf TEXT file's header —
    the leading lines starting with ``meta_prefix`` (VCF '#' lines,
    GTF comments); 0 for headerless formats (BED)."""
    import zlib

    pref = meta_prefix.encode()
    buf = bytearray()
    with open(path, "rb") as f:
        while True:
            hdr = f.read(18)
            if len(hdr) < 18:
                break
            size = _block_size(hdr)
            buf += zlib.decompress(hdr + f.read(size - 18), 31)
            # the header ends at the first complete line NOT starting
            # with the prefix; keep reading while the boundary is unclear
            h = 0
            complete = True
            while h < len(buf):
                nl = buf.find(b"\n", h)
                if nl < 0:
                    complete = False
                    break
                if not buf[h:h + len(pref)] == pref:
                    return h, bytes(buf[:h])
                h = nl + 1
            if complete and h == len(buf):
                continue  # every full line so far is header; read on
    # whole file is header (or empty)
    h = 0
    while h < len(buf):
        nl = buf.find(b"\n", h)
        if nl < 0 or buf[h:h + len(pref)] != pref:
            break
        h = nl + 1
    return h, bytes(buf[:h])


def _split_part(path: str, h_len: int,
                h_bytes: bytes) -> tuple[bytes, int, int, bool, bytes]:
    """(header_bytes, record_start, record_end, clean, boundary_tail):
    byte offsets of the record-block region in the part file (EOF
    marker excluded). ``clean`` means the header ended exactly on a
    block boundary (raw copy preserves every virtual offset);
    otherwise ``boundary_tail`` holds the re-compressed record bytes of
    the header-straddling block."""
    import zlib

    with open(path, "rb") as f:
        data = f.read()
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
    `samtools cat`) into ``out`` by raw block copy. ``index='bai'`` (or
    ``'csi'`` for long-contig parts) additionally merges the parts'
    sidecars into ``out + '.bai'/'.csi'`` — requires every part to be
    clean (header block-aligned, true for this repo's writer) with a
    sidecar present. Returns {'parts': n, 'bytes': total,
    'clean': all_clean}."""
    if index not in (None, "bai", "csi"):
        raise ValueError("cat_bam index must be 'bai'/'csi' (or None)")
    return _cat(parts, out, _bam_header_len, index)


def _bcf_header_len(path: str) -> tuple[int, bytes]:
    """(uncompressed byte length, bytes) of the BCF header section:
    magic BCF\\x02\\x02 + l_text + the NUL-terminated header text."""
    import zlib

    buf = bytearray()
    need = 9
    with open(path, "rb") as f:
        while len(buf) < need:
            hdr = f.read(18)
            if len(hdr) < 18:
                raise ValueError(f"{path}: truncated BCF")
            size = _block_size(hdr)
            buf += zlib.decompress(hdr + f.read(size - 18), 31)
            if len(buf) >= 9:
                if buf[:3] != b"BCF":
                    raise ValueError(f"{path} is not BCF")
                (l_text,) = struct.unpack_from("<I", buf, 5)
                need = 9 + l_text
    return need, bytes(buf[:need])


def cat_bcf(parts: list[str], out: str,
            index: str | None = None) -> dict:
    """Concatenate BCF ``parts`` (identical headers required) by raw
    block copy; ``index='csi'`` merges the parts' ``.csi`` sidecars
    (same voffset arithmetic — CSI's per-bin loffsets take the min of
    the shifted values, metadata pseudo-bins envelope/sum)."""
    if index not in (None, "csi"):
        raise ValueError("cat_bcf index must be 'csi' (or None)")
    return _cat(parts, out, _bcf_header_len, index)


def cat_bgzf_text(parts: list[str], out: str, index: str | None = None,
                  meta_prefix: str = "#") -> dict:
    """Concatenate BGZF TEXT parts (bgzf VCF/GTF/GFF/BED from this
    repo's writers) into one file by raw block copy: part 0 keeps its
    header lines, later parts (identical headers required) contribute
    record blocks only. ``index='tbi'`` merges the parts' tabix
    sidecars (same voffset arithmetic as the BAI merge; refs keyed by
    NAME, so parts may cover different chromosome subsets)."""
    if index not in (None, "tbi"):
        raise ValueError("cat_bgzf_text index must be 'tbi' (or None)")
    return _cat(parts, out,
                lambda p: _text_header_len(p, meta_prefix), index)


def _cram_bounds(path: str) -> tuple[int, int, int, str]:
    """(data_start, data_end, file_size, header_text) for a CRAM file:
    data containers live in [data_start, data_end); the EOF container
    (+ anything after it) starts at data_end. CRAM containers are
    self-contained (no inter-container state in the no-ref profile this
    repo writes and htslib's default), so concatenation is a container-
    stream splice — the walk reads only container HEADERS, O(#containers)
    seeks, zero record decode."""
    import os

    from oxbow_spark.sources.cram import (ContainerHeader, Cursor,
                                          _HDR_BUF, read_block)

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(26)
        if head[:4] != b"CRAM":
            raise ValueError(f"{path} is not CRAM (bad magic)")
        c = Cursor(f.read(_HDR_BUF))
        h = ContainerHeader(c)
        f.seek(26 + h.body_offset)
        body = Cursor(f.read(h.length))
        _t, _cid, raw = read_block(body)
        (l_text,) = struct.unpack("<i", raw[:4])
        text = raw[4:4 + l_text].rstrip(b"\x00").decode("utf-8", "replace")
        data_start = 26 + h.body_offset + h.length
        off = data_start
        while off < size:
            f.seek(off)
            hb = f.read(_HDR_BUF)
            if len(hb) < 8:
                break
            ch = ContainerHeader(Cursor(hb))
            if ch.is_eof:
                return data_start, off, size, text
            off += ch.body_offset + ch.length
    # no EOF container (tolerated on read like htslib's warning path):
    # data runs to the end of the file
    return data_start, size, size, text


def cat_cram(parts: list[str], out: str, index: str | None = None) -> dict:
    """Concatenate CRAM ``parts`` (identical SAM header text required,
    like `samtools cat`) into ``out`` by container-stream splice: part
    0 is kept through its last data container, later parts contribute
    their data containers verbatim (file definition + header container
    skipped), then part 0's EOF container closes the file. Containers
    are self-contained, so this is a raw byte copy — no record decode,
    no re-compression; container-header (ref, start, span) metadata
    rides along, so the merged file still region-prunes without an
    index. ``index='crai'`` additionally merges the parts' ``.crai``
    sidecars: every line's absolute container offset shifts by that
    part's byte delta, slice-internal fields are untouched. Returns
    {'parts': n, 'bytes': total, 'clean': True}."""
    if index not in (None, "crai"):
        raise ValueError("cat_cram index must be 'crai' (or None)")
    if not parts:
        raise ValueError("cat: no parts")
    bounds = [_cram_bounds(p) for p in parts]
    text0 = bounds[0][3]
    for p, (_ds, _de, _sz, text) in zip(parts[1:], bounds[1:]):
        if text != text0:
            raise ValueError(
                f"{p}: SAM header differs from {parts[0]} — cat requires "
                "identical headers (same @SQ dictionary and text)")
    if index is not None:
        missing = [p for p in parts if not _exists(p + ".crai")]
        if missing:
            raise ValueError(f"missing .crai sidecars: {missing}")

    deltas: list[int] = []
    total = 0
    with open(out, "wb") as fo:
        for i, (p, (ds, de, _sz, _t)) in enumerate(zip(parts, bounds)):
            with open(p, "rb") as fi:
                if i == 0:
                    deltas.append(0)
                    fo.write(fi.read(de))  # filedef + header + data
                    total += de
                else:
                    deltas.append(total - ds)
                    fi.seek(ds)
                    fo.write(fi.read(de - ds))
                    total += de - ds
        # close with part 0's own EOF container (version-matched bytes)
        ds0, de0, sz0, _t0 = bounds[0]
        if sz0 > de0:
            with open(parts[0], "rb") as fi:
                fi.seek(de0)
                eof = fi.read(sz0 - de0)
            fo.write(eof)
            total += len(eof)
    if index == "crai":
        _merge_crai([p + ".crai" for p in parts], deltas, out + ".crai")
    return {"parts": len(parts), "bytes": total, "clean": True}


def _merge_crai(crai_paths: list[str], deltas: list[int],
                out_path: str) -> None:
    """Merge .crai sidecars for a container-spliced CRAM: each line's
    container offset (field 4) shifts by its part's constant byte
    delta; slice offset/size (fields 5-6) are container-internal and
    copy through. Lines keep part order — offsets are monotone because
    parts are spliced in order."""
    import gzip

    lines: list[str] = []
    for path, delta in zip(crai_paths, deltas):
        with gzip.open(path, "rt") as f:
            for ln in f.read().splitlines():
                ln = ln.strip()
                if not ln:
                    continue
                fields = ln.split("\t")
                if len(fields) < 6:
                    raise ValueError(f"malformed .crai line: {ln!r}")
                fields[3] = str(int(fields[3]) + delta)
                lines.append("\t".join(fields))
    with gzip.open(out_path, "wt") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _cat(parts: list[str], out: str, header_len_fn,
         index: str | None) -> dict:
    if not parts:
        raise ValueError("cat: no parts")
    infos = []
    for p in parts:
        h_len, h_bytes = header_len_fn(p)
        infos.append(_split_part(p, h_len, h_bytes))
    h0 = infos[0][0]
    for p, (h, *_rest) in zip(parts[1:], infos[1:]):
        if h != h0:
            raise ValueError(
                f"{p}: header differs from {parts[0]} — cat requires "
                "identical headers (same @SQ dictionary and text)")
    all_clean = all(i[3] for i in infos)
    if index is not None:
        if not all_clean:
            raise ValueError(
                "index merge needs header-block-aligned parts (this "
                "repo's writer); re-index the merged file instead")
        missing = [p for p in parts if not _exists(p + "." + index)]
        if missing:
            raise ValueError(f"missing .{index} sidecars: {missing}")

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
    elif index == "tbi":
        _merge_tbi([p + ".tbi" for p in parts], deltas, out + ".tbi")
    elif index == "csi":
        _merge_csi([p + ".csi" for p in parts], deltas, out + ".csi")
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
                        # 0 means "unset" on BOTH sides: never pin the
                        # merged envelope begin at 0 just because an
                        # earlier part had an empty ref
                        if vlo:
                            meta[0] = (min(meta[0], vlo)
                                       if meta[0] else vlo)
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


def _tbi_raw(path: str):
    """Raw tabix parse preserving all 8 header ints (TabixIndex.read
    folds the base-format value away): (hdr8, names, refs, n_no_coor)
    with refs = [(bins{id: [(beg, end)]}, linear[int])]."""
    import gzip

    with gzip.open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"TBI\x01":
        raise ValueError(f"{path} is not a tabix index")
    hdr8 = list(struct.unpack_from("<8i", data, 4))
    off = 36
    l_nm = hdr8[7]
    names = [s.decode() for s in data[off:off + l_nm].split(b"\x00") if s]
    off += l_nm
    refs = []
    for _ in range(hdr8[0]):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        bins: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_id, n_chunk = struct.unpack_from("<Ii", data, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                beg, end = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((beg, end))
            bins[bin_id] = chunks
        (n_intv,) = struct.unpack_from("<i", data, off)
        off += 4
        lin = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        off += 8 * n_intv
        refs.append((bins, lin))
    n_no_coor = None
    if off + 8 <= len(data):
        (n_no_coor,) = struct.unpack_from("<Q", data, off)
    return hdr8, names, refs, n_no_coor


def _merge_tbi(tbi_paths: list[str], deltas: list[int],
               out_path: str) -> None:
    """Merge tabix sidecars: refs keyed by NAME (parts may cover
    different chrom subsets), chunks voffset-shifted, metadata
    pseudo-bins (37450 for the default 5-level scheme) envelope/sum
    merged, linear windows elementwise-min."""
    import gzip

    parsed = [_tbi_raw(p) for p in tbi_paths]
    fmt = parsed[0][0][1:7]
    for p, (h8, *_r) in zip(tbi_paths[1:], parsed[1:]):
        if h8[1:7] != fmt:
            raise ValueError(f"{p}: tabix format header differs")

    names: list[str] = []
    by_name: dict[str, tuple[dict, list, list | None]] = {}
    for (h8, nms, refs, _nc), d in zip(parsed, deltas):
        for nm, (bins, lin) in zip(nms, refs):
            if nm not in by_name:
                names.append(nm)
                by_name[nm] = ({}, [], None)
            dst_bins, dst_lin, _m = by_name[nm]
            meta = by_name[nm][2]
            for b, chunks in bins.items():
                if b == 37450:
                    (vlo, vhi), (mp, un) = chunks
                    vlo, vhi = _shift(vlo, d), _shift(vhi, d)
                    if meta is None:
                        meta = [vlo, vhi, mp, un]
                    else:
                        # 0 means "unset" on BOTH sides: never pin the
                        # merged envelope begin at 0 just because an
                        # earlier part had an empty ref
                        if vlo:
                            meta[0] = (min(meta[0], vlo)
                                       if meta[0] else vlo)
                        meta[1] = max(meta[1], vhi)
                        meta[2] += mp
                        meta[3] += un
                    by_name[nm] = (dst_bins, dst_lin, meta)
                    continue
                dst_bins.setdefault(b, []).extend(
                    (_shift(s, d), _shift(e, d)) for s, e in chunks)
            if len(lin) > len(dst_lin):
                dst_lin.extend([0] * (len(lin) - len(dst_lin)))
            for w, v in enumerate(lin):
                sv = _shift(v, d)
                if sv and (dst_lin[w] == 0 or sv < dst_lin[w]):
                    dst_lin[w] = sv
            by_name[nm] = (dst_bins, dst_lin, by_name[nm][2])

    nm_blob = b"".join(nm.encode() + b"\x00" for nm in names)
    out = [b"TBI\x01",
           struct.pack("<8i", len(names), *parsed[0][0][1:7], len(nm_blob)),
           nm_blob]
    for nm in names:
        bins, lin, meta = by_name[nm]
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
        out.append(struct.pack("<i", len(lin)))
        for v in lin:
            out.append(struct.pack("<Q", v))
    ncs = [p[3] for p in parsed if p[3] is not None]
    if ncs:
        out.append(struct.pack("<Q", sum(ncs)))
    from oxbow_spark.sources.align_write import bgzf_compress as _bc

    with open(out_path, "wb") as f:
        f.write(_bc(b"".join(out)) + BGZF_EOF)


def _csi_raw(path: str):
    """Raw CSI parse preserving every field: (min_shift, depth, aux,
    refs, n_no_coor) with refs = [[(bin, loffset, [(beg, end)])]]."""
    import gzip

    with gzip.open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"CSI\x01":
        raise ValueError(f"{path} is not a CSI index")
    min_shift, depth, l_aux = struct.unpack_from("<3i", data, 4)
    off = 16
    aux = data[off:off + l_aux]
    off += l_aux
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        bins = []
        for _ in range(n_bin):
            bin_id, loff, n_chunk = struct.unpack_from("<IQi", data, off)
            off += 16
            chunks = []
            for _ in range(n_chunk):
                beg, end = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((beg, end))
            bins.append((bin_id, loff, chunks))
        refs.append(bins)
    n_no_coor = None
    if off + 8 <= len(data):
        (n_no_coor,) = struct.unpack_from("<Q", data, off)
    return min_shift, depth, aux, refs, n_no_coor


def _merge_csi(csi_paths: list[str], deltas: list[int],
               out_path: str) -> None:
    """Merge CSI sidecars (identical min_shift/depth/aux and ref count
    required — guaranteed by identical headers): per (ref, bin) the
    shifted chunk lists concatenate and loffset takes the min of the
    shifted non-zero values; metadata pseudo-bins (id ≥ bin_limit)
    merge their voffset envelope and sum their counts."""
    parsed = [_csi_raw(p) for p in csi_paths]
    min_shift, depth, aux = parsed[0][0], parsed[0][1], parsed[0][2]
    n_ref = len(parsed[0][3])
    for p, pr in zip(csi_paths[1:], parsed[1:]):
        if (pr[0], pr[1], pr[2]) != (min_shift, depth, aux) \
                or len(pr[3]) != n_ref:
            raise ValueError(f"{p}: CSI parameters differ")
    bin_limit = ((1 << (3 * (depth + 1))) - 1) // 7

    out = [b"CSI\x01",
           struct.pack("<3i", min_shift, depth, len(aux)), aux,
           struct.pack("<i", n_ref)]
    for r in range(n_ref):
        bins: dict[int, list[tuple[int, int]]] = {}
        loffs: dict[int, int] = {}
        meta = None  # [vlo, vhi, mapped, unmapped]
        for (_ms, _d, _a, refs, _nc), dlt in zip(parsed, deltas):
            for bin_id, loff, chunks in refs[r]:
                if bin_id >= bin_limit and len(chunks) == 2:
                    (vlo, vhi), (mp, un) = chunks
                    vlo, vhi = _shift(vlo, dlt), _shift(vhi, dlt)
                    if meta is None:
                        meta = [vlo, vhi, mp, un]
                    else:
                        # 0 means "unset" on BOTH sides: never pin the
                        # merged envelope begin at 0 just because an
                        # earlier part had an empty ref
                        if vlo:
                            meta[0] = (min(meta[0], vlo)
                                       if meta[0] else vlo)
                        meta[1] = max(meta[1], vhi)
                        meta[2] += mp
                        meta[3] += un
                    continue
                dst = bins.setdefault(bin_id, [])
                dst.extend((_shift(b, dlt), _shift(e, dlt))
                           for b, e in chunks)
                sl = _shift(loff, dlt)
                if sl and (bin_id not in loffs or sl < loffs[bin_id]):
                    loffs[bin_id] = sl
        out.append(struct.pack(
            "<i", len(bins) + (1 if meta is not None else 0)))
        for b in sorted(bins):
            chunks = bins[b]
            out.append(struct.pack("<IQi", b, loffs.get(b, 0),
                                   len(chunks)))
            for cs, ce in chunks:
                out.append(struct.pack("<QQ", cs, ce))
        if meta is not None:
            # htslib META_BIN = n_bins + 1 (37450 at depth 5); foreign
            # pseudo-bins at bin_limit are renumbered up, never down
            meta_bin = bin_limit + 1
            out.append(struct.pack("<IQi", meta_bin, 0, 2))
            out.append(struct.pack("<QQ", meta[0], meta[1]))
            out.append(struct.pack("<QQ", meta[2], meta[3]))
    ncs = [p[4] for p in parsed if p[4] is not None]
    out.append(struct.pack("<Q", sum(ncs) if ncs else 0))
    from oxbow_spark.sources.align_write import bgzf_compress as _bc

    with open(out_path, "wb") as f:
        f.write(_bc(b"".join(out)) + BGZF_EOF)
