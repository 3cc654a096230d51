"""BCF writer: ``df.write.format("bcf")``.

Beyond the reference (no writers). Encodes the VCF scan schema (chrom,
pos, id, ref, alt, qual, filter, typed info struct, per-sample genotype
structs in the default ``genotype_by='sample'`` orientation) back into
BCF2.2 binary records (spec §6.3: typed descriptors, int width
selection, MISSING/EOV sentinels, GT allele packing), BGZF-compressed
with the standard EOF marker — htslib-consumable and byte-validated by
round-tripping through this repo's own BCF decoder.

Requirements and documented corners:
- the ``header`` option must carry the full VCF header text, including
  ``##contig`` lines covering every written chromosome (the BCF contig
  dictionary) and the ``##FILTER/INFO/FORMAT`` lines that define the
  string dictionary — the same implicit-index rules the reader applies
  (`bcf.py:string_dictionary`);
- float values are stored as f32 (the BCF wire type); doubles sourced
  from VCF text round-trip through the nearest f32;
- the VCF-text quirk ``k=`` (string list ``[None]``) has no distinct
  BCF representation and writes as an empty string (reads back None).
"""

from __future__ import annotations

import struct
from typing import Iterator

from oxbow_spark.models.vcf_header import VcfHeader
from oxbow_spark.sources.align_write import (
    BGZF_EOF,
    _AlignmentWriter,
    _BgzfStreamWriter,
    _PartFile,
)

_MISSING = {1: -128, 2: -32768, 3: -2147483648}
_EOV = {1: -127, 2: -32767, 3: -2147483647}
_FMT = {1: "b", 2: "h", 3: "i"}
_MISSING_FLOAT = struct.pack("<I", 0x7F800001)
_EOV_FLOAT = struct.pack("<I", 0x7F800002)


def _desc(t: int, n: int) -> bytes:
    if n < 15:
        return bytes([(n << 4) | t])
    return bytes([0xF0 | t]) + _typed_int(n)


def _int_width(vals) -> int:
    lo = min((v for v in vals if v is not None), default=0)
    hi = max((v for v in vals if v is not None), default=0)
    if -120 <= lo and hi <= 127:
        return 1
    if -32000 <= lo and hi <= 32767:
        return 2
    return 3


def _typed_int(v: int) -> bytes:
    t = _int_width([v])
    return _desc(t, 1) + struct.pack(f"<{_FMT[t]}", v)


def _typed_int_vec(vals: list[int | None], pad_to: int | None = None) -> bytes:
    n = pad_to if pad_to is not None else len(vals)
    t = _int_width(vals)
    out = bytearray(_desc(t, n))
    for v in vals:
        out += struct.pack(f"<{_FMT[t]}",
                           _MISSING[t] if v is None else int(v))
    for _ in range(n - len(vals)):
        out += struct.pack(f"<{_FMT[t]}", _EOV[t])
    return bytes(out)


def _typed_float_vec(vals: list[float | None],
                     pad_to: int | None = None) -> bytes:
    n = pad_to if pad_to is not None else len(vals)
    out = bytearray(_desc(5, n))
    for v in vals:
        out += _MISSING_FLOAT if v is None else struct.pack("<f", float(v))
    for _ in range(n - len(vals)):
        out += _EOV_FLOAT
    return bytes(out)


def _typed_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _desc(7, len(b)) + b


def _gt_codes(gt) -> list[int]:
    """Inverse of `bcf.py:decode_gt`: (allele, phased) struct → packed
    ints ((a+1)<<1 | phased; missing allele → 0). A sample with no GT
    encodes as a zero-length (all-EOV) cell so it decodes back to
    None, not './.'."""
    if gt is None:
        return []
    d = gt if isinstance(gt, dict) else gt.asDict()
    alleles, phased = d.get("allele") or [], d.get("phased") or []
    out = []
    for i, a in enumerate(alleles):
        ph = int(bool(phased[i])) if i < len(phased) else 0
        out.append(0 if a is None else ((int(a) + 1) << 1) | ph)
    return out or [0]


class BcfWriter(_AlignmentWriter):
    SUFFIX = ".bcf"

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        from oxbow_spark.sources.bcf import contig_dictionary, string_dictionary

        text = options.get("header")
        if not text:
            raise ValueError(
                "the bcf writer requires a `header` option (full VCF header "
                "text incl. ##contig dictionary lines)")
        self.header_text = text
        lines = [ln for ln in text.splitlines() if ln.startswith("#")]
        self.hdr = VcfHeader.parse(lines)
        self.contig_ids = {c: i for i, c in enumerate(contig_dictionary(lines))}
        self.string_ids = {s: i for i, s in enumerate(string_dictionary(lines))}
        self.info_defs = {d.name: d for d in self.hdr.infos}
        self.fmt_defs = list(self.hdr.formats)

    # -- encoders -----------------------------------------------------------

    def _info_value(self, d, v) -> bytes:
        if d.is_flag:
            return _typed_int(1)
        if d.vtype == "Integer":
            vals = v if isinstance(v, (list, tuple)) else [v]
            return _typed_int_vec([None if x is None else int(x)
                                   for x in vals])
        if d.vtype == "Float":
            vals = v if isinstance(v, (list, tuple)) else [v]
            return _typed_float_vec(vals)
        s = ",".join("" if x is None else str(x) for x in v) \
            if isinstance(v, (list, tuple)) else str(v)
        return _typed_str(s)

    def _fmt_cells(self, d, cells: list) -> bytes:
        """One FORMAT field across samples → typed meta + fixed-width
        cells (EOV padding for ragged vectors, MISSING for absent)."""
        if d.name == "GT":
            codes = [_gt_codes(c) for c in cells]
            ln = max(len(c) for c in codes)
            flat = [x for c in codes for x in c + [None] * (ln - len(c))]
            t = _int_width([x for x in flat if x is not None])
            out = bytearray(_desc(t, ln))
            for c in codes:
                for x in c:
                    out += struct.pack(f"<{_FMT[t]}", x)
                for _ in range(ln - len(c)):
                    out += struct.pack(f"<{_FMT[t]}", _EOV[t])
            return bytes(out)
        if d.vtype in ("Integer", "Float"):
            vecs = []
            for c in cells:
                if c is None:
                    vecs.append([None])
                elif isinstance(c, (list, tuple)):
                    vecs.append(list(c))
                else:
                    vecs.append([c])
            ln = max(len(v) for v in vecs)
            if d.vtype == "Float":
                out = bytearray(_desc(5, ln))
                for v in vecs:
                    for x in v:
                        out += (_MISSING_FLOAT if x is None
                                else struct.pack("<f", float(x)))
                    out += _EOV_FLOAT * (ln - len(v))
                return bytes(out)
            allv = [x for v in vecs for x in v if x is not None]
            t = _int_width(allv)
            out = bytearray(_desc(t, ln))
            for v in vecs:
                for x in v:
                    out += struct.pack(
                        f"<{_FMT[t]}", _MISSING[t] if x is None else int(x))
                for _ in range(ln - len(v)):
                    out += struct.pack(f"<{_FMT[t]}", _EOV[t])
            return bytes(out)
        # String / Character: fixed-width char cells, NUL-padded
        strs = []
        for c in cells:
            if c is None:
                strs.append(b".")
            elif isinstance(c, (list, tuple)):
                strs.append(",".join(str(x) for x in c).encode("utf-8"))
            else:
                strs.append(str(c).encode("utf-8"))
        ln = max(len(s) for s in strs)
        out = bytearray(_desc(7, ln))
        for s in strs:
            out += s.ljust(ln, b"\x00")
        return bytes(out)

    def _record(self, d: dict) -> bytes:
        chrom = d["chrom"]
        if chrom not in self.contig_ids:
            raise ValueError(
                f"chromosome {chrom!r} is not in the header's ##contig "
                "dictionary — BCF requires contig lines for every chrom")
        ref = d.get("ref") or ""
        alts = list(d.get("alt") or [])
        qual = d.get("qual")
        info = d.get("info")
        info_d = ({} if info is None
                  else info if isinstance(info, dict) else info.asDict())
        info_items = [
            (self.info_defs[k], v) for k, v in info_d.items()
            if v is not None and v is not False and k in self.info_defs
        ]
        samples = [s for s in self.hdr.samples if s in d]
        fmt_items = []
        if samples:
            cells_by_def = {}
            for fd in self.fmt_defs:
                cells = []
                for s in samples:
                    sv = d[s]
                    sd = (sv if isinstance(sv, dict)
                          else sv.asDict() if sv is not None else {})
                    cells.append(sd.get(fd.name))
                if any(c is not None for c in cells):
                    cells_by_def[fd.name] = (fd, cells)
            fmt_items = list(cells_by_def.values())

        shared = bytearray()
        shared += struct.pack("<iii", self.contig_ids[chrom],
                              int(d["pos"]) - 1, max(len(ref), 1))
        shared += (_MISSING_FLOAT if qual is None
                   else struct.pack("<f", float(qual)))
        shared += struct.pack(
            "<II", ((1 + len(alts)) << 16) | len(info_items),
            (len(fmt_items) << 24) | len(samples))
        ids = d.get("id")
        shared += _typed_str(";".join(ids) if ids else ".")
        shared += _typed_str(ref)
        for a in alts:
            shared += _typed_str(a)
        flt = d.get("filter")
        if flt is None:
            shared += _typed_int_vec([])
        elif not list(flt):
            shared += _typed_int_vec([self.string_ids["PASS"]])
        else:
            shared += _typed_int_vec([self.string_ids[f] for f in flt])
        for de, v in info_items:
            shared += _typed_int(self.string_ids[de.name])
            shared += self._info_value(de, v)
        indiv = bytearray()
        for fd, cells in fmt_items:
            indiv += _typed_int(self.string_ids[fd.name])
            indiv += self._fmt_cells(fd, cells)
        return (struct.pack("<II", len(shared), len(indiv))
                + bytes(shared) + bytes(indiv))

    def write(self, iterator: Iterator) -> _PartFile:
        import re as _re

        from oxbow_spark.sources.align_write import (
            _CsiBuilder,
            bgzf_compress,
            csi_depth_for,
        )

        out = self._part_path()
        kind = (self.options.get("index") or "").lower()
        if kind not in ("", "csi"):
            raise ValueError(
                f"bcf writer: unknown index kind {kind!r} (BCF's "
                "standard index is 'csi')")
        csi = None
        if kind == "csi":
            lens = [int(m) for m in _re.findall(
                r"##contig=<[^>]*length=(\d+)", self.header_text)]
            min_shift = int(self.options.get("csi_min_shift", 14))
            depth = int(self.options.get(
                "csi_depth", csi_depth_for(max(lens, default=0), min_shift)))
            csi = _CsiBuilder(len(self.contig_ids), min_shift, depth)
        text = "".join(
            ln.rstrip("\n") + "\n"
            for ln in self.header_text.splitlines() if ln.strip())
        tb = text.encode("utf-8") + b"\x00"
        n = 0
        with open(out, "wb") as f:
            w = _BgzfStreamWriter(f)
            w.write(b"BCF\x02\x02" + struct.pack("<I", len(tb)) + tb)
            # header block-aligned: parts raw-copy concatenable
            # (sources/cat.py:cat_bcf)
            w.flush()
            for row in iterator:
                d = row.asDict()
                vstart = w.vtell()
                w.write(self._record(d))
                n += 1
                if csi is not None:
                    pos0 = int(d["pos"]) - 1
                    csi.add(self.contig_ids[d["chrom"]], pos0,
                            pos0 + max(len(d.get("ref") or ""), 1),
                            vstart, w.vtell())
            w.close()
            f.write(BGZF_EOF)
        if csi is not None:
            with open(out + ".csi", "wb") as fi:
                fi.write(bgzf_compress(csi.serialize()) + BGZF_EOF)
        return _PartFile(out, n)
