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
from oxbow_spark.sources.base import DEFAULT_BATCH_SIZE, resolve_paths, select_fields
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
        self._arrow_schema = to_arrow_schema(self.codec_schema)

    # -- planning ---------------------------------------------------------
    def partitions(self):
        parts: list[BamPartition] = []
        for path in self.paths:
            with BgzfReader(path) as r:
                hdr, ref_names, first_vpos = read_bam_header(r)
            size = fsio.getsize(path)
            bai_path = next(
                (p for p in (path + ".bai", path[:-4] + ".bai") if fsio.exists(p)),
                None,
            )
            if bai_path:
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
            std_idx = [STANDARD_FIELD_NAMES.index(n) for n in self.names if n in STANDARD_FIELD_NAMES]
            project = self.names != STANDARD_FIELD_NAMES or self.with_tags
            rows, n = [], 0
            while r.tell_virtual() < part.vend:
                szb = r.read(4)
                if len(szb) < 4:
                    break
                (block_size,) = struct.unpack("<i", szb)
                buf = r.read(block_size)
                if len(buf) < block_size:
                    break
                row, tags = parse_record(buf, ref_names, self.with_tags)
                if part.regions is not None and not _coords.alignment_record_passes(
                    part.regions, row[2], row[3], row[11]
                ):
                    continue
                if self.coord_offset:
                    for i in (3, 7):
                        if row[i] is not None:
                            row[i] += self.coord_offset
                out = [row[i] for i in std_idx] if project else row
                if self.with_tags:
                    out = list(out) + [{
                        d.name: (d.parse(*tags[d.name]) if d.name in tags else None)
                        for d in self.tag_defs
                    }]
                rows.append(out)
                n += 1
                if len(rows) >= self.batch_size:
                    yield self._emit(rows)
                    rows = []
                if 0 <= self.limit <= n:
                    break
            if rows:
                yield self._emit(rows)


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


class BamDataSource(DataSource):
    NATIVE_CS = "11"

    @classmethod
    def name(cls) -> str:
        return "bam"

    def __init__(self, options: dict):
        super().__init__(options)
        self.paths = resolve_paths(options.get("path"))
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

        return PushdownBamReader(self) if pushdown_enabled() else BamReader(self)
