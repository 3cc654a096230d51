"""BAM DataSource: ``spark.read.format("bam")``.

Parity: reference BAM scanner (`oxbow/src/alignment/scanner/bam.rs:155-166`,
SURVEY S2) with index-driven range pushdown
(`bam.rs:175-206`) and index-derived partitioning
(`scan_virtual_ranges`, `bam.rs:263-279`; planner SURVEY D1/D2).

Scale design: ``partitions()`` is the reference's shuffle-less
distribution contract — with a ``.bai`` alongside the file, the BGZF
stream is cut at linear-index virtual positions pruned to
``chunksize`` compressed bytes; each executor seeks its vpos range
independently (no coordination). With ``regions``, partitions are the
merged index chunks per region and records are residual-checked
(`batch_iterator/query.rs:142-159`). Schema and options match the SAM
source (same alignment Model).

Options: ``fields``, ``tags`` ('scan[:N]'), ``tag_defs``, ``coords``,
``regions`` (';'-separated; ``*`` → unmapped section via index, SURVEY
F2), ``batch_size``, ``limit``, ``chunksize`` (compressed bytes per
partition, default 16 MiB).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.pandas.types import to_arrow_schema

from oxbow_spark.sources.pushdown import region_from_filters

from oxbow_spark import coords as _coords
from oxbow_spark.models.sam_header import (
    STANDARD_FIELD_NAMES,
    STANDARD_FIELDS,
    SamHeader,
    TagDef,
    tags_struct,
)
from oxbow_spark.sources.base import (
    DEFAULT_BATCH_SIZE,
    GenomicStreamMixin,
    resolve_paths,
    select_fields,
)
from oxbow_spark.sources.bgzf import (

    BaiIndex,
    BgzfReader,
    CsiIndex,
    coalesce_chunks,
    partition_from_index,
    query_chunks,
)
from oxbow_spark.sources import fsio

SEQ_CODES = "=ACMGRSVTWYHKDBN"
CIGAR_OPS = "MIDNSHP=X"
_REF_CONSUMING = {0, 2, 3, 7, 8}  # M D N = X

DEFAULT_CHUNKSIZE = 16 * 1024 * 1024
# byte-based flush cap: seq expands ~2x from packed nibbles, so 256 MiB of
# framed record bodies keeps every utf8 column comfortably inside the
# int32 Arrow offset range (2 GiB) even for ultra-long reads
MAX_BATCH_BYTES = 256 * 1024 * 1024

# ---- vectorized decode tables (see _decode_columns) ----------------------
# 4-bit seq codes expand through byte-indexed lookup: one table per nibble.
_SEQ_HI = np.frombuffer(
    bytes(ord(SEQ_CODES[b >> 4]) for b in range(256)), dtype=np.uint8
)
_SEQ_LO = np.frombuffer(
    bytes(ord(SEQ_CODES[b & 0xF]) for b in range(256)), dtype=np.uint8
)
# BAM fixed-size record prefix (SAMv1 §4.2), 32 bytes little-endian.
_FIXED_DTYPE = np.dtype([
    ("ref_id", "<i4"), ("pos", "<i4"), ("l_read_name", "u1"), ("mapq", "u1"),
    ("bin", "<u2"), ("n_cigar", "<u2"), ("flag", "<u2"), ("l_seq", "<i4"),
    ("next_ref", "<i4"), ("next_pos", "<i4"), ("tlen", "<i4"),
])
_CIGAR_CHARS = np.array(list(CIGAR_OPS))
_REF_CONSUME = np.array([c in "MDN=X" for c in CIGAR_OPS] + [False] * 7)


def _gather_ranges(arr: np.ndarray, offs: np.ndarray, lens: np.ndarray):
    """Concatenate arr[offs[i]:offs[i]+lens[i]] for all i — one fancy-index
    gather. Returns (gathered, out_starts) with out_starts[i] the start of
    record i's slice in the gathered array.

    The index vector is built with a single cumsum over a mostly-ones
    delta array (jump-corrected at range boundaries) — ~3x faster than
    the textbook repeat+arange construction at BAM batch sizes."""
    total = int(lens.sum())
    out_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    if total == 0:
        return arr[:0], out_starts
    nz = lens > 0
    o, l = offs[nz], lens[nz]
    b = np.concatenate(([0], np.cumsum(l)))[:-1]
    delta = np.ones(total, dtype=np.int64)
    delta[0] = o[0]
    if len(o) > 1:
        delta[b[1:]] = o[1:] - (o[:-1] + l[:-1]) + 1
    idx = np.cumsum(delta)
    return arr[idx], out_starts


def read_bam_header(r: BgzfReader) -> tuple[SamHeader, list[str], int]:
    """Parse the BAM header block; returns (header, ref_names, vpos of
    first record)."""
    magic = r.read(4)
    if magic != b"BAM\x01":
        raise ValueError("not a BAM file (bad magic)")
    (l_text,) = struct.unpack("<i", r.read(4))
    text = r.read(l_text).rstrip(b"\x00").decode("utf-8", "replace")
    (n_ref,) = struct.unpack("<i", r.read(4))
    names = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", r.read(4))
        nm = r.read(l_name)[:-1].decode()
        r.read(4)  # l_ref (header text usually repeats it)
        names.append(nm)
    hdr = SamHeader.parse([ln for ln in text.splitlines() if ln.startswith("@")])
    if not hdr.chrom_names:
        hdr.chrom_names = names
    return hdr, names, r.tell_virtual()


def decode_tags(buf: bytes, off: int, end: int) -> dict[str, tuple[str, object]]:
    """Binary tag block → {name: (sam_type_code, value)}."""
    out: dict[str, tuple[str, object]] = {}
    while off + 3 <= end:
        name = buf[off:off + 2].decode("ascii", "replace")
        t = chr(buf[off + 2])
        off += 3
        if t == "A":
            out[name] = ("A", chr(buf[off])); off += 1
        elif t in "cC":
            v = struct.unpack_from("<b" if t == "c" else "<B", buf, off)[0]
            out[name] = ("i", v); off += 1
        elif t in "sS":
            v = struct.unpack_from("<h" if t == "s" else "<H", buf, off)[0]
            out[name] = ("i", v); off += 2
        elif t in "iI":
            v = struct.unpack_from("<i" if t == "i" else "<I", buf, off)[0]
            out[name] = ("i", v); off += 4
        elif t == "f":
            out[name] = ("f", struct.unpack_from("<f", buf, off)[0]); off += 4
        elif t in "ZH":
            z = buf.index(b"\x00", off)
            out[name] = (t, buf[off:z].decode("ascii", "replace")); off = z + 1
        elif t == "B":
            sub = chr(buf[off]); (n,) = struct.unpack_from("<i", buf, off + 1)
            off += 5
            fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
            vals = list(struct.unpack_from(f"<{n}{fmt}", buf, off))
            off += n * struct.calcsize(fmt)
            out[name] = ("B" + sub, vals)
        else:
            break
    return out


def parse_record(buf: bytes, ref_names: list[str], want_tags: bool):
    """One BAM record body (after block_size) → full standard row
    [qname flag rname pos mapq cigar rnext pnext tlen seq qual end] (+tag
    dict). pos is returned 1-based (SAM text convention)."""
    ref_id, pos0, l_read_name, mapq, _bin, n_cigar, flag, l_seq, next_ref, next_pos0, tlen = (
        struct.unpack_from("<iiBBHHHiiii", buf, 0)
    )
    off = 32
    qname = buf[off:off + l_read_name - 1].decode("ascii", "replace")
    off += l_read_name
    cigar_ops = struct.unpack_from(f"<{n_cigar}I", buf, off)
    off += 4 * n_cigar
    nseq = (l_seq + 1) // 2
    seq_bytes = buf[off:off + nseq]
    off += nseq
    quals = buf[off:off + l_seq]
    off += l_seq

    rname = ref_names[ref_id] if ref_id >= 0 else None
    pos = pos0 + 1 if ref_id >= 0 and pos0 >= 0 else None
    cigar = None
    end = None
    if n_cigar:
        parts = []
        reflen = 0
        for op in cigar_ops:
            ln, code = op >> 4, op & 0xF
            parts.append(f"{ln}{CIGAR_OPS[code]}")
            if code in _REF_CONSUMING:
                reflen += ln
        cigar = "".join(parts)
        if pos is not None and reflen:
            end = pos + reflen - 1
    seq = None
    if l_seq:
        chars = []
        for b in seq_bytes:
            chars.append(SEQ_CODES[b >> 4])
            chars.append(SEQ_CODES[b & 0xF])
        seq = "".join(chars[:l_seq])
    qual = None
    if l_seq and quals and quals[0] != 0xFF:
        qual = "".join(chr(q + 33) for q in quals)
    rnext = ref_names[next_ref] if next_ref >= 0 else None
    pnext = next_pos0 + 1 if next_ref >= 0 and next_pos0 >= 0 else None

    row = [
        qname if qname != "*" else None,
        flag, rname, pos,
        None if mapq == 255 else mapq,
        cigar, rnext, pnext, tlen, seq, qual, end,
    ]
    tags = decode_tags(buf, off, len(buf)) if want_tags else None
    return row, tags


def _utf8_array(lengths: np.ndarray, data: np.ndarray, null_mask=None) -> pa.Array:
    """Arrow utf8 array straight from (per-row byte lengths, contiguous
    value bytes) — no intermediate Python strings. Null rows keep their
    offset span (bytes are ignored at null slots). BAM text fields are
    ASCII by spec, so the bytes are valid UTF-8 as-is."""
    n = len(lengths)
    total = int(lengths.sum()) if n else 0
    if total >= 2**31:
        # int32 Arrow offsets would wrap silently → corrupt column. The
        # reader's byte-based flush (MAX_BATCH_BYTES) keeps batches far
        # below this; hitting it means a single batch of ultra-long reads
        # slipped through — fail loudly rather than emit garbage.
        raise ValueError(
            f"utf8 column of {total} bytes exceeds int32 offset range; "
            "reduce batch_size for ultra-long-read data"
        )
    offs = np.empty(n + 1, dtype=np.int32)
    offs[0] = 0
    offs[1:] = np.cumsum(lengths)
    data = np.ascontiguousarray(data)
    if null_mask is not None and null_mask.any():
        validity = np.packbits(~null_mask, bitorder="little")
        return pa.Array.from_buffers(
            pa.utf8(), n,
            [pa.py_buffer(validity), pa.py_buffer(offs), pa.py_buffer(data)],
            null_count=int(null_mask.sum()),
        )
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offs), pa.py_buffer(data)]
    )


def decode_record_batch(
    big: bytes,
    starts: np.ndarray,
    lens: np.ndarray,
    ref_names: list[str],
    names: list[str],
    tag_defs,
    coord_offset: int,
    regions,
    max_rows: int,
    arrow_schema: pa.Schema,
) -> tuple[pa.RecordBatch | None, int]:
    """Vectorized decode of a batch of raw BAM record bodies into one Arrow
    RecordBatch (columns in ``names`` order, + 'tags' when ``tag_defs``).

    Numpy does the heavy lifting once per batch instead of Python per
    record/base: the 32-byte fixed prefixes are gathered into an (n, 32)
    matrix and viewed as a structured dtype; seq nibbles expand through two
    256-entry lookup tables; quals are one vectorized +33; cigar op words
    decode in one shot with reference-consumed lengths via add.reduceat.
    Column work is gated on the projection: an unselected seq/qual/cigar
    is never decoded (reference scan-time projection, SURVEY P2), and with
    ``regions`` only surviving records get their string columns built.

    ``max_rows`` < 0 means no limit. Returns (batch | None, rows_kept).
    """
    n = len(starts)
    if n == 0:
        return None, 0
    arr = np.frombuffer(big, dtype=np.uint8)
    fixed = arr[starts[:, None] + np.arange(32)]
    f = fixed.view(_FIXED_DTYPE)[:, 0]
    ref_id = f["ref_id"].astype(np.int64)
    pos0 = f["pos"].astype(np.int64)
    l_rn = f["l_read_name"].astype(np.int64)
    n_cig = f["n_cigar"].astype(np.int64)
    l_seq = f["l_seq"].astype(np.int64)
    qn_off = starts + 32
    cig_off = qn_off + l_rn
    seq_off = cig_off + 4 * n_cig
    nseq = (l_seq + 1) // 2
    qual_off = seq_off + nseq
    tag_off = qual_off + l_seq
    rec_end = starts + lens

    sel = set(names)
    need_end = "end" in sel or regions is not None
    need_cigar = "cigar" in sel or need_end

    has_ref = ref_id >= 0
    pos_valid = has_ref & (pos0 >= 0)
    pos1 = pos0 + 1

    reflen = np.zeros(n, dtype=np.int64)
    op_len = op_code = op_pos = None
    if need_cigar:
        ops_b, op_byte_starts = _gather_ranges(arr, cig_off, 4 * n_cig)
        ops = np.ascontiguousarray(ops_b).view("<u4").astype(np.int64)
        op_len = ops >> 4
        op_code = ops & 0xF
        op_pos = op_byte_starts // 4
        if ops.size:
            nz = n_cig > 0
            consume = np.where(_REF_CONSUME[op_code], op_len, 0)
            reflen[nz] = np.add.reduceat(consume, op_pos[nz])
    end1 = np.where(pos_valid & (reflen > 0), pos1 + reflen - 1, 0)
    end_valid = pos_valid & (reflen > 0)

    if regions is not None:
        keep_list = []
        for i in range(n):
            rn = ref_names[ref_id[i]] if has_ref[i] else None
            p = int(pos1[i]) if pos_valid[i] else None
            e = int(end1[i]) if end_valid[i] else None
            if _coords.alignment_record_passes(regions, rn, p, e):
                keep_list.append(i)
        keep = np.array(keep_list, dtype=np.int64)
    else:
        keep = np.arange(n)
    if max_rows >= 0:
        keep = keep[:max_rows]
    k = len(keep)
    if k == 0:
        return None, 0

    rnames_obj = np.array(ref_names + [None], dtype=object)

    def _name_col(ids, valid):
        lookup = np.where(valid, ids, len(ref_names))
        return rnames_obj[lookup]

    def _masked_int(vals, valid, typ):
        return pa.array(vals, type=typ, mask=~np.asarray(valid, dtype=bool))

    cols = []
    for fld in arrow_schema:
        nm = fld.name
        if nm == "qname":
            qlens = (l_rn - 1)[keep]
            qdata, _ = _gather_ranges(arr, qn_off[keep], qlens)
            star = (l_rn[keep] == 2) & (arr[qn_off[keep]] == 0x2A)
            cols.append(_utf8_array(qlens, qdata, star))
        elif nm == "flag":
            cols.append(pa.array(f["flag"][keep].astype(np.int32), type=fld.type))
        elif nm == "rname":
            cols.append(pa.array(_name_col(ref_id, has_ref)[keep], type=fld.type))
        elif nm == "pos":
            cols.append(_masked_int(
                (pos1 + coord_offset)[keep], pos_valid[keep], fld.type))
        elif nm == "mapq":
            mq = f["mapq"][keep].astype(np.int16)
            cols.append(_masked_int(mq, mq != 255, fld.type))
        elif nm == "cigar":
            parts = np.char.add(op_len.astype("U10"), _CIGAR_CHARS[op_code])
            cig = [
                "".join(parts[op_pos[i]:op_pos[i] + n_cig[i]]) if n_cig[i] else None
                for i in keep
            ]
            cols.append(pa.array(cig, type=fld.type))
        elif nm == "rnext":
            nref = f["next_ref"].astype(np.int64)
            cols.append(pa.array(_name_col(nref, nref >= 0)[keep], type=fld.type))
        elif nm == "pnext":
            nref = f["next_ref"].astype(np.int64)
            npos = f["next_pos"].astype(np.int64)
            pv = (nref >= 0) & (npos >= 0)
            cols.append(_masked_int(
                (npos + 1 + coord_offset)[keep], pv[keep], fld.type))
        elif nm == "tlen":
            cols.append(pa.array(f["tlen"][keep].astype(np.int32), type=fld.type))
        elif nm == "seq":
            ls = l_seq[keep]
            sb, s_starts = _gather_ranges(arr, seq_off[keep], nseq[keep])
            pair = np.empty(2 * len(sb), dtype=np.uint8)
            pair[0::2] = _SEQ_HI[sb]
            pair[1::2] = _SEQ_LO[sb]
            if (ls & 1).any():
                # odd-length reads leave a pad nibble; squeeze it out
                pair, _ = _gather_ranges(pair, 2 * s_starts, ls)
            cols.append(_utf8_array(ls, pair, ls == 0))
        elif nm == "qual":
            ls = l_seq[keep]
            qb, q_starts = _gather_ranges(arr, qual_off[keep], ls)
            null = ls == 0
            if len(qb):
                first = qb[np.minimum(q_starts, len(qb) - 1)]
                null = null | ((first == 0xFF) & (ls > 0))
            cols.append(_utf8_array(ls, (qb + 33).astype(np.uint8), null))
        elif nm == "end":
            cols.append(_masked_int(end1[keep], end_valid[keep], fld.type))
        elif nm == "tags":
            rows = []
            for i in keep:
                tags = decode_tags(big, int(tag_off[i]), int(rec_end[i]))
                rows.append({
                    d.name: (d.parse(*tags[d.name]) if d.name in tags else None)
                    for d in tag_defs
                })
            cols.append(pa.array(rows, type=fld.type))
        else:  # pragma: no cover - schema is constructed from these names
            raise ValueError(f"unknown BAM column {nm!r}")
    return pa.RecordBatch.from_arrays(cols, schema=arrow_schema), k


class BamPartition(InputPartition):
    def __init__(self, path: str, vstart: int, vend: int, regions: tuple | None = None):
        self.path = path
        self.vstart = vstart
        self.vend = vend
        # union residual filter: tuple of (name, start0, end0) / ("*",)
        # entries (coords.residual_entries), or None for no filter
        self.regions = regions


class BamReader(DataSourceReader):
    def __init__(self, src: "BamDataSource"):
        self.paths = src.paths
        self.codec_schema = src.spark_schema
        self.names = src.names
        self.tag_defs = src.tag_defs
        self.with_tags = src.tag_defs is not None
        self.coord_offset = src.coord_offset
        self.batch_size = int(src.options.get("batch_size", DEFAULT_BATCH_SIZE))
        self.limit = int(src.options.get("limit", -1))
        self.chunksize = int(src.options.get("chunksize", DEFAULT_CHUNKSIZE))
        self.regions = src.regions
        self.index_path = src.options.get("index")
        self._arrow_schema = to_arrow_schema(self.codec_schema)

    # -- planning ---------------------------------------------------------
    def partitions(self):
        parts: list[BamPartition] = []
        for path in self.paths:
            with BgzfReader(path) as r:
                hdr, ref_names, first_vpos = read_bam_header(r)
            size = fsio.getsize(path)
            explicit = self.index_path  # `index` option: reference parity
            bai_path = next(
                (p for p in (path + ".bai", path[:-4] + ".bai") if fsio.exists(p)),
                None,
            )
            if explicit:
                index = (CsiIndex.read(explicit) if explicit.endswith(".csi")
                         else BaiIndex.read(explicit))
            elif bai_path:
                index = BaiIndex.read(bai_path)
            elif fsio.exists(path + ".csi"):
                index = CsiIndex.read(path + ".csi")  # >512 Mb chromosomes
            else:
                index = None
            max_pos = 1 << (
                getattr(index, "min_shift", 14) + getattr(index, "depth", 5) * 3
            )
            if self.regions:
                # regions are pre-merged (coords.merge_regions); chunks are
                # pooled across regions and coalesced, and every partition
                # residual-checks the whole union, so a record overlapping
                # two regions — or two regions sharing an index chunk — is
                # emitted exactly once.
                mapped = [r for r in self.regions if not r.is_unmapped]
                resid = _coords.residual_entries(mapped)
                if index is None and mapped:
                    parts.append(BamPartition(path, first_vpos, size << 16, resid))
                elif mapped:
                    chunks: list[tuple[int, int]] = []
                    for reg in mapped:
                        if reg.name not in ref_names:
                            continue  # unknown chrom: zero hits by definition
                        rid = ref_names.index(reg.name)
                        end = reg.end if reg.end is not None else max_pos
                        chunks.extend(query_chunks(index, rid, reg.start, end))
                    for cb, ce in coalesce_chunks(chunks):
                        parts.append(BamPartition(path, cb, ce, resid))
                if any(r.is_unmapped for r in self.regions):
                    # unmapped section: after the last indexed chunk
                    start = first_vpos
                    if index:
                        ends = [
                            ce for ref in index.refs
                            for cs in ref.bins.values() for _, ce in cs
                        ]
                        if ends:
                            start = max(ends)
                    parts.append(BamPartition(path, start, size << 16, (("*",),)))
            elif index is not None:
                for vs, ve in partition_from_index(index, self.chunksize, first_vpos, size):
                    parts.append(BamPartition(path, vs, ve))
            else:
                parts.append(BamPartition(path, first_vpos, size << 16))
        # Spark requires ≥1 partition: a region with no index hits yields an
        # empty vpos range (reads nothing but keeps the plan valid)
        return parts or [BamPartition(self.paths[0], 0, 0)]

    # -- execution --------------------------------------------------------
    def _emit(self, rows):
        cols = list(zip(*rows)) if rows else [[] for _ in self._arrow_schema]
        arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, self._arrow_schema)]
        return pa.RecordBatch.from_arrays(arrays, schema=self._arrow_schema)

    def read(self, part: BamPartition):
        with BgzfReader(part.path) as r:
            hdr, ref_names, first_vpos = read_bam_header(r)
            r.seek_virtual(max(part.vstart, first_vpos))
            emitted = 0
            bufs: list[bytes] = []

            def flush():
                nonlocal bufs, emitted
                if not bufs:
                    return None
                big = b"".join(bufs)
                lens = np.fromiter(
                    (len(b) for b in bufs), dtype=np.int64, count=len(bufs)
                )
                starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
                remaining = self.limit - emitted if self.limit >= 0 else -1
                batch, got = decode_record_batch(
                    big, starts, lens, ref_names, self.names, self.tag_defs,
                    self.coord_offset, part.regions, remaining,
                    self._arrow_schema,
                )
                bufs = []
                emitted += got
                return batch

            # without a region filter the kept-row count equals the framed
            # count, so a limit can stop framing early
            def frame_cap() -> int:
                if self.limit < 0 or part.regions is not None:
                    return self.batch_size
                return max(1, min(self.batch_size, self.limit - emitted))

            bytes_acc = 0
            while r.tell_virtual() < part.vend:
                szb = r.read(4)
                if len(szb) < 4:
                    break
                (block_size,) = struct.unpack("<i", szb)
                buf = r.read(block_size)
                if len(buf) < block_size:
                    break
                bufs.append(buf)
                bytes_acc += block_size
                # flush on bytes as well as record count: a batch_size
                # batch of long reads (nanopore) could otherwise push a
                # utf8 column past the int32 Arrow offset range (seq
                # expands ~2x from packed nibbles)
                if len(bufs) >= frame_cap() or bytes_acc >= MAX_BATCH_BYTES:
                    batch = flush()
                    if batch is not None:
                        yield batch
                    bytes_acc = 0
                    if 0 <= self.limit <= emitted:
                        return
            batch = flush()
            if batch is not None:
                yield batch


class PushdownBamReader(BamReader):
    """BamReader + automatic filter→region pushdown; only planned on
    sessions with spark.sql.python.filterPushdown.enabled (see
    sources/pushdown.py)."""

    def pushFilters(self, filters):
        """Translate (rname =, pos range) conjuncts into an index-pruning
        region; every filter is returned unsupported so Spark re-applies
        the exact predicate after the (over-approximate) pruned scan."""
        if not self.regions:
            reg = region_from_filters(filters, "rname", "pos", self.coord_offset)
            if reg is not None:
                self.regions = [reg]
        return filters


class BamDataSource(GenomicStreamMixin, DataSource):
    NATIVE_CS = "11"

    @classmethod
    def name(cls) -> str:
        return "bam"

    def __init__(self, options: dict):
        super().__init__(options)
        try:
            self.paths = resolve_paths(options.get("path"))
        except FileNotFoundError:
            self.paths = []  # write mode: target needn't exist yet
        self.names = select_fields(STANDARD_FIELD_NAMES, options.get("fields"))
        requested = options.get("coords", self.NATIVE_CS)
        self.coord_offset = _coords.start_offset(self.NATIVE_CS, requested)
        self.regions = _coords.merge_regions(_coords.parse_regions(
            options.get("regions"), options.get("region_cs", self.NATIVE_CS)
        ))
        self.tag_defs = self._tag_defs()
        fields = [T.StructField(nm, dict(STANDARD_FIELDS)[nm], True) for nm in self.names]
        if self.tag_defs is not None:
            fields.append(T.StructField("tags", tags_struct(self.tag_defs), True))
        self.spark_schema = T.StructType(fields)

    def writer(self, schema, overwrite: bool):
        from oxbow_spark.sources.align_write import BamWriter

        return BamWriter(self.options, overwrite)

    def header(self) -> SamHeader:
        with BgzfReader(self.paths[0]) as r:
            hdr, names, _ = read_bam_header(r)
        return hdr

    def _tag_defs(self) -> list[TagDef] | None:
        explicit = self.options.get("tag_defs")
        if explicit:
            return [TagDef(*spec.strip().split(":", 1)) for spec in explicit.split(",")]
        scan = self.options.get("tags")
        if not scan:
            return None
        n = int(scan.split(":")[1]) if ":" in scan else 1024
        order: list[str] = []
        codes: dict[str, str] = {}
        with BgzfReader(self.paths[0]) as r:
            _, ref_names, _ = read_bam_header(r)
            for _ in range(n):
                szb = r.read(4)
                if len(szb) < 4:
                    break
                (bs,) = struct.unpack("<i", szb)
                buf = r.read(bs)
                if len(buf) < bs:
                    break
                _, tags = parse_record(buf, ref_names, True)
                for nm, (code, _v) in (tags or {}).items():
                    if nm not in codes:
                        order.append(nm)
                        codes[nm] = code
        return [TagDef(nm, codes[nm]) for nm in order]

    def schema(self) -> T.StructType:
        return self.spark_schema

    def reader(self, schema: T.StructType) -> BamReader:
        from oxbow_spark.sources.pushdown import pushdown_enabled

        if not self.paths:
            raise FileNotFoundError(f"no files match {self.options.get('path')!r}")
        return PushdownBamReader(self) if pushdown_enabled() else BamReader(self)


def idxstats(path: str, index_path: str | None = None
             ) -> list[tuple[str, int, int, int]]:
    """samtools-idxstats without touching record bytes: per-reference
    (rname, length, n_mapped, n_unmapped) from the BAM header's
    reference dictionary plus the index's metadata pseudo-bins (BAI bin
    37450 / CSI META_BIN — `bgzf.index_stats`), ending with the
    ('*', 0, 0, n_no_coor) row for coordinate-less records, exactly like
    samtools' output. References whose index carries no pseudo-bin
    report zeros (minimal indexers omit it). O(index) work — suitable
    driver-side even for a multi-TB BAM."""
    from oxbow_spark.sources.bgzf import index_stats

    with BgzfReader(path) as r:
        hdr, ref_names, _ = read_bam_header(r)
    sizes = dict(hdr.chrom_sizes or {})
    if index_path:
        index = (CsiIndex.read(index_path) if index_path.endswith(".csi")
                 else BaiIndex.read(index_path))
    elif fsio.exists(path + ".bai"):
        index = BaiIndex.read(path + ".bai")
    elif fsio.exists(path + ".csi"):
        index = CsiIndex.read(path + ".csi")
    else:
        raise FileNotFoundError(f"no .bai/.csi index next to {path}")
    stats = index_stats(index)
    out = []
    for i, nm in enumerate(ref_names):
        mapped, unmapped = (stats[i] if i < len(stats)
                            and stats[i] is not None else (0, 0))
        out.append((nm, sizes.get(nm, 0), mapped, unmapped))
    out.append(("*", 0, 0, index.n_no_coor or 0))
    return out
