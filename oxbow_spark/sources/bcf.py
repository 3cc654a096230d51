"""BCF DataSource: ``spark.read.format("bcf")``.

Parity: reference BCF scanner (`oxbow/src/variant/scanner/bcf.rs`, SURVEY
S5) — same Model/schema as VCF (the source subclasses the VCF DataSource
for header parsing, option handling and schema assembly) with the BCF2.2
binary record codec (public spec: SAMv1/VCFv4.x specification §6).

BCF specifics handled here:
- typed values (int8/16/32, float, char) with 15-length extension,
  MISSING and END-OF-VECTOR sentinels;
- the string dictionary (FILTER/INFO/FORMAT ids in order of appearance,
  IDX= override, implicit PASS at 0) and the contig dictionary;
- GT encoding ``(allele+1)<<1 | phased`` per sample;
- String INFO/FORMAT values with list Numbers are comma-joined in BCF
  and are split back to lists to match the VCF text semantics.
"""

from __future__ import annotations

import os
import struct

import pyarrow as pa
from pyspark.sql.datasource import DataSourceReader, InputPartition
from pyspark.sql.pandas.types import to_arrow_schema

from oxbow_spark.models.vcf_header import VcfHeader
from oxbow_spark.sources.base import DEFAULT_BATCH_SIZE
from oxbow_spark.sources.bgzf import BgzfReader
from oxbow_spark.sources.vcf import VcfCodec, VcfDataSource

from oxbow_spark.sources import fsio

_MISSING = {1: -128, 2: -32768, 3: -2147483648}
_EOV = {1: -127, 2: -32767, 3: -2147483647}
_FMT = {1: "<b", 2: "<h", 3: "<i", 5: "<f"}
_MISSING_FLOAT_BITS = 0x7F800001
_EOV_FLOAT_BITS = 0x7F800002


class _Buf:
    __slots__ = ("b", "o")

    def __init__(self, b: bytes, o: int = 0):
        self.b = b
        self.o = o

    def u8(self) -> int:
        v = self.b[self.o]
        self.o += 1
        return v

    def take(self, fmt: str, n: int):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(f"<{n}{fmt[-1]}", self.b, self.o)
        self.o += size * n
        return vals


def _typed_meta(buf: _Buf) -> tuple[int, int]:
    """Read a type descriptor byte (+ extended length) → (type, length)."""
    d = buf.u8()
    t, ln = d & 0xF, d >> 4
    if ln == 15:
        t2, n2 = _typed_meta(buf)
        ln = _typed_values_raw(buf, t2, n2)[0]
    return t, ln


def _typed_values_raw(buf: _Buf, t: int, n: int):
    if t == 0 or n == 0:
        return []
    if t == 7:  # char vector → str
        s = buf.b[buf.o:buf.o + n]
        buf.o += n
        return [s.decode("ascii", "replace")]
    return list(buf.take(_FMT[t], n))


def _clean_ints(vals: list[int], t: int) -> list[int | None]:
    out = []
    for v in vals:
        if v == _EOV[t]:
            break
        out.append(None if v == _MISSING[t] else v)
    return out


def _clean_floats(vals: list[float]) -> list[float | None]:
    out = []
    for v in vals:
        bits = struct.unpack("<I", struct.pack("<f", v))[0]
        if bits == _EOV_FLOAT_BITS:
            break
        out.append(None if bits == _MISSING_FLOAT_BITS else v)
    return out


def read_typed(buf: _Buf):
    """One typed value → (kind, values) where kind ∈ {'int','float','str'}."""
    t, n = _typed_meta(buf)
    raw = _typed_values_raw(buf, t, n)
    if t == 7:
        s = raw[0] if raw else ""
        return "str", s
    if t == 5:
        return "float", _clean_floats(raw)
    if t in _MISSING:
        return "int", _clean_ints(raw, t)
    return "int", []


def string_dictionary(header_lines: list[str]) -> list[str]:
    """FILTER/INFO/FORMAT id dictionary (spec §6.2.1): implicit PASS at 0,
    then ids in order of appearance; IDX= overrides the position."""
    d: dict[int, str] = {0: "PASS"}
    nxt = 1
    import re

    for line in header_lines:
        m = re.match(r"^##(FILTER|INFO|FORMAT)=<(.*)>\s*$", line)
        if not m:
            continue
        body = m.group(2)
        idm = re.search(r"ID=([^,>]+)", body)
        if not idm:
            continue
        name = idm.group(1)
        if name in d.values():
            continue
        idxm = re.search(r"IDX=(\d+)", body)
        if idxm:
            d[int(idxm.group(1))] = name
        else:
            while nxt in d:
                nxt += 1
            d[nxt] = name
            nxt += 1
    return [d.get(i, f"?{i}") for i in range(max(d) + 1)]


def contig_dictionary(header_lines: list[str]) -> list[str]:
    import re

    d: dict[int, str] = {}
    nxt = 0
    for line in header_lines:
        m = re.match(r"^##contig=<(.*)>\s*$", line)
        if not m:
            continue
        body = m.group(1)
        idm = re.search(r"ID=([^,>]+)", body)
        if not idm:
            continue
        idxm = re.search(r"IDX=(\d+)", body)
        if idxm:
            d[int(idxm.group(1))] = idm.group(1)
        else:
            while nxt in d:
                nxt += 1
            d[nxt] = idm.group(1)
            nxt += 1
    return [d.get(i, f"?{i}") for i in range(max(d) + 1)] if d else []


def read_bcf_header(r: BgzfReader) -> tuple[VcfHeader, list[str], list[str]]:
    magic = r.read(5)
    if magic[:3] != b"BCF":
        raise ValueError("not a BCF file (bad magic)")
    (l_text,) = struct.unpack("<I", r.read(4))
    text = r.read(l_text).split(b"\x00", 1)[0].decode("utf-8", "replace")
    lines = text.splitlines()
    hdr = VcfHeader.parse(lines)
    return hdr, string_dictionary(lines), contig_dictionary(lines)


def decode_gt(vals: list[int | None]) -> dict | None:
    if not vals:
        return None
    alleles, phased = [], []
    for v in vals:
        if v is None or v == 0:
            alleles.append(None)
            phased.append(False)
        else:
            alleles.append((v >> 1) - 1)
            phased.append(bool(v & 1))
    return {"allele": alleles, "phased": phased}


class _RawReader:
    """Plain-file stand-in for BgzfReader (uncompressed BCF)."""

    def __init__(self, path: str):
        self.f = fsio.open_binary(path)

    def read(self, n: int) -> bytes:
        return self.f.read(n)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.f.close()


def open_bcf(path: str):
    with fsio.open_binary(path) as f:
        magic = f.read(3)
    return _RawReader(path) if magic == b"BCF" else BgzfReader(path)


class BcfPartition(InputPartition):
    def __init__(self, path: str, vstart: int = -1, vend: int = -1):
        self.path = path
        # -1 → whole file; else a half-open BGZF virtual-position range of
        # record starts (CSI chunks / partition_from_index cuts)
        self.vstart = vstart
        self.vend = vend


DEFAULT_BCF_CHUNKSIZE = 16 * 1024 * 1024


class BcfReader(DataSourceReader):
    def __init__(self, src: "BcfDataSource"):
        self.paths = src.paths
        from oxbow_spark import coords as _coords

        self.codec: VcfCodec = src.codec()
        self.batch_size = int(src.options.get("batch_size", DEFAULT_BATCH_SIZE))
        self.limit = int(src.options.get("limit", -1))
        self.chunksize = int(src.options.get("chunksize", DEFAULT_BCF_CHUNKSIZE))
        self.regions = _coords.merge_regions(_coords.parse_regions(
            src.options.get("regions"), src.options.get("region_cs", "11")
        ))
        self._arrow_schema = to_arrow_schema(self.codec.schema)

    def partitions(self):
        """CSI-pushed planning (SURVEY F1/D1 for BCF): with a .csi index,
        region queries prune to index chunks and full scans split into
        ~chunksize vpos ranges; without one, one partition per file with
        residual-only filtering (the pre-CSI behavior)."""
        from oxbow_spark.sources.bgzf import (
            CsiIndex,
            coalesce_chunks,
            partition_from_index,
            query_chunks,
        )

        parts: list[BcfPartition] = []
        for p in self.paths:
            csi_path = p + ".csi"
            with fsio.open_binary(p) as f:
                raw = f.read(3) == b"BCF"  # uncompressed BCF: not splittable
            if raw or not fsio.exists(csi_path):
                parts.append(BcfPartition(p))
                continue
            idx = CsiIndex.read(csi_path)
            with open_bcf(p) as r:
                _hdr, _strings, contigs = read_bcf_header(r)
                first_vpos = r.tell_virtual()
            if self.regions:
                max_pos = 1 << (idx.min_shift + idx.depth * 3)
                chunks: list[tuple[int, int]] = []
                for reg in self.regions:
                    if reg.is_unmapped or reg.name not in contigs:
                        continue
                    rid = contigs.index(reg.name)
                    end = reg.end if reg.end is not None else max_pos
                    chunks.extend(query_chunks(idx, rid, reg.start, end))
                for cb, ce in coalesce_chunks(chunks):
                    parts.append(BcfPartition(p, cb, ce))
            else:
                size = fsio.getsize(p)
                for vs, ve in partition_from_index(idx, self.chunksize, first_vpos, size):
                    parts.append(BcfPartition(p, vs, ve))
        return parts or [BcfPartition(self.paths[0], 0, 0)]

    def _emit(self, rows):
        cols = list(zip(*rows)) if rows else [[] for _ in self._arrow_schema]
        arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, self._arrow_schema)]
        return pa.RecordBatch.from_arrays(arrays, schema=self._arrow_schema)

    def _decode_record(self, shared: bytes, indiv: bytes, strings: list[str],
                       contigs: list[str]):
        c = self.codec
        hdr = c.header
        b = _Buf(shared)
        chrom_id, pos0, _rlen = struct.unpack_from("<iii", shared, 0)
        b.o = 12
        (qual,) = struct.unpack_from("<f", shared, 12)
        b.o = 16
        n_allele_info, n_fmt_sample = struct.unpack_from("<II", shared, 16)
        b.o = 24
        n_info = n_allele_info & 0xFFFF
        n_allele = n_allele_info >> 16
        n_sample = n_fmt_sample & 0xFFFFFF
        n_fmt = n_fmt_sample >> 24

        _, rid = read_typed(b)          # ID string
        alleles = []
        for _ in range(n_allele):
            _, a = read_typed(b)
            alleles.append(a if isinstance(a, str) else "")
        kind, filt = read_typed(b)      # FILTER int vector
        qbits = struct.unpack("<I", struct.pack("<f", qual))[0]
        qual_v = None if qbits == _MISSING_FLOAT_BITS else qual

        filt_names = [strings[i] for i in filt if i is not None] if kind == "int" else []
        if filt_names == ["PASS"]:
            filter_v: list | None = []
        elif not filt_names:
            filter_v = None
        else:
            filter_v = filt_names

        row = [
            contigs[chrom_id] if chrom_id < len(contigs) else str(chrom_id),
            pos0 + 1,
            [] if not rid or rid == "." else rid.split(";"),
            alleles[0] if alleles else "",
            alleles[1:],
            qual_v,
            filter_v,
        ]

        info_vals: dict[str, object] = {}
        for _ in range(n_info):
            _, key = read_typed(b)
            key_id = key[0] if key else 0
            name = strings[key_id] if key_id < len(strings) else None
            kind, vals = read_typed(b)
            if name:
                info_vals[name] = (kind, vals)
        if c.info_names is not None:
            out = {}
            for nm in c.info_names:
                d = next((x for x in hdr.infos if x.name == nm), None)
                out[nm] = _coerce_info(d, info_vals.get(nm))
            row.append(out)

        if c.gt_names is not None:
            bi = _Buf(indiv)
            per_field: dict[str, list] = {}
            for _ in range(n_fmt):
                _, key = read_typed(bi)
                key_id = key[0] if key else 0
                name = strings[key_id] if key_id < len(strings) else None
                t, ln = _typed_meta(bi)
                vals_per_sample = []
                for _s in range(n_sample):
                    raw = _typed_values_raw(bi, t, ln)
                    if t == 7:
                        vals_per_sample.append(("str", raw[0] if raw else ""))
                    elif t == 5:
                        vals_per_sample.append(("float", _clean_floats(raw)))
                    elif t in _MISSING:
                        vals_per_sample.append(("int", _clean_ints(raw, t)))
                    else:
                        vals_per_sample.append(("int", []))
                if name:
                    per_field[name] = vals_per_sample
            sample_idx = {s: i for i, s in enumerate(hdr.samples)}
            per_sample_out = {}
            for s in c.samples:
                i = sample_idx[s]
                rec = {}
                for nm in c.gt_names:
                    d = next((x for x in hdr.formats if x.name == nm), None)
                    cell = per_field.get(nm)
                    v = cell[i] if cell and i < len(cell) else None
                    if nm == "GT":
                        rec[nm] = decode_gt(v[1]) if v and v[0] == "int" else None
                    else:
                        rec[nm] = _coerce_fmt(d, v)
                per_sample_out[s] = rec
            if c.genotype_by == "sample":
                cols = [per_sample_out[s] for s in c.samples]
            else:
                cols = [
                    {s: per_sample_out[s][g] for s in c.samples} for g in c.gt_names
                ]
            if c.samples_nested:
                names = c.samples if c.genotype_by == "sample" else c.gt_names
                row.append(dict(zip(names, cols)))
            else:
                row.extend(cols)
        return row

    def read(self, part: BcfPartition):
        ranged = getattr(part, "vstart", -1) >= 0
        if ranged and part.vstart >= part.vend:
            yield self._emit([])
            return
        with open_bcf(part.path) as r:
            hdr, strings, contigs = read_bcf_header(r)
            if ranged:
                r.seek_virtual(max(part.vstart, r.tell_virtual()))
            c = self.codec
            rows, n = [], 0
            while True:
                if ranged and r.tell_virtual() >= part.vend:
                    break
                head = r.read(8)
                if len(head) < 8:
                    break
                l_shared, l_indiv = struct.unpack("<II", head)
                shared = r.read(l_shared)
                indiv = r.read(l_indiv)
                if len(shared) < l_shared or len(indiv) < l_indiv:
                    break
                row = self._decode_record(shared, indiv, strings, contigs)
                if self.regions:
                    iv = (row[0], row[1] - 1, row[1] - 1 + len(row[3]))
                    if not any(
                        (not reg.is_unmapped)
                        and reg.name == iv[0]
                        and reg.overlaps(iv[1], iv[2])
                        for reg in self.regions
                    ):
                        continue
                if c.coord_offset:
                    row[1] += c.coord_offset
                if c.project_indexes is not None:
                    row = [row[i] for i in c.project_indexes]
                rows.append(row)
                n += 1
                if len(rows) >= self.batch_size:
                    yield self._emit(rows)
                    rows = []
                if 0 <= self.limit <= n:
                    break
            if rows:
                yield self._emit(rows)


def _coerce_info(d, cell):
    """(kind, vals) from the wire → the VCF-text-equivalent python value."""
    if d is None or cell is None:
        return None
    kind, vals = cell
    if d.is_flag:
        return True
    if kind == "str":
        s = vals
        if not s or s == ".":
            return None
        return s if d.is_scalar else s.split(",")
    if not vals:
        return None
    if d.is_scalar:
        return vals[0]
    return list(vals)


def _coerce_fmt(d, cell):
    if d is None or cell is None:
        return None
    kind, vals = cell
    if kind == "str":
        s = vals
        if not s or s == ".":
            return None
        return s if d.is_scalar else s.split(",")
    if not vals or all(v is None for v in vals):
        return None
    if d.is_scalar:
        return vals[0]
    return list(vals)


class BcfDataSource(VcfDataSource):
    @classmethod
    def name(cls) -> str:
        return "bcf"

    def header(self) -> VcfHeader:
        with open_bcf(self.paths[0]) as r:
            hdr, _, _ = read_bcf_header(r)
        return hdr

    def reader(self, schema) -> BcfReader:
        return BcfReader(self)
