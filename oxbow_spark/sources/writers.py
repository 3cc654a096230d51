"""Text-format writers: ``df.write.format("vcf"/"bed"/"fasta"/"fastq")``.

Beyond the reference (no writers there). Same distributed contract as the
alignment writers (`align_write.py`): each task emits one self-contained,
spec-conformant part file; rows follow this repo's scan conventions, so
read → transform → write round-trips are value-lossless (text may
renormalize: float formatting, absent-vs-'.' INFO keys — the same
renormalizations htslib applies).

The VCF writer inverts the scan's typed structures against the header
(``header`` option, required): id/alt/filter lists, the typed INFO
struct (Flag keys bare, Number=. lists comma-joined, missing elements
'.'), and per-sample genotype structs in the default
``genotype_by='sample'`` orientation — GT renders from its
(allele, phased) struct with phasing preserved, FORMAT keys follow
header order with GT first per spec.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSourceWriter

from oxbow_spark.models.vcf_header import VcfHeader
from oxbow_spark.sources.align_write import (
    _PartFile,
    _prepare_dir,
    _reconcile_parts,
)


class _TextPartWriter(DataSourceWriter):
    SUFFIX = ""
    # tabix header preset (fmt_flags, col_seq, col_beg, col_end, meta) —
    # set by subclasses that support index='tbi'/'csi'
    TBI_PRESET: tuple[int, int, int, int, str] | None = None
    # index kinds a subclass handles in its own write() override
    EXTRA_INDEX_KINDS: tuple[str, ...] = ()

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("writer needs a target path")
        self.options = dict(options)
        self._overwrite = bool(overwrite)
        _prepare_dir(self.path, overwrite, self.SUFFIX)
        self.bgzf = (options.get("compression") or "").lower() == "bgzf"
        self.index_kind = (options.get("index") or "").lower()
        if self.index_kind not in ("", "tbi", "csi") + self.EXTRA_INDEX_KINDS:
            raise ValueError(f"unknown index kind {self.index_kind!r}")
        if self.index_kind in self.EXTRA_INDEX_KINDS:
            self.index_kind = ""  # handled by the subclass's write()
        self.tbi = self.index_kind == "tbi"
        if self.index_kind and self.TBI_PRESET is None:
            raise ValueError(
                f"index={self.index_kind!r} is not supported by the "
                f"{self.SUFFIX} writer")
        if self.index_kind and not self.bgzf:
            raise ValueError(
                f"index={self.index_kind!r} requires compression='bgzf'")
        if self.bgzf:
            self.suffix = self.SUFFIX + ".gz"
            _prepare_dir(self.path, overwrite, self.suffix)

    def _part_path(self) -> str:
        import os
        import uuid

        # partition id first (Spark's part-file convention): with
        # range-partitioned input, committed_parts()'s numeric
        # partition-id order is global order
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        suffix = getattr(self, "suffix", self.SUFFIX)
        return os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:12]}{suffix}")

    def commit(self, messages) -> None:
        _reconcile_parts(self.path, messages, fresh=self._overwrite,
                         suffix=getattr(self, "suffix", self.SUFFIX))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)

    def _head(self) -> str:
        return ""

    def _line(self, d: dict) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def _interval(self, d: dict):  # (chrom, beg0, end0) for tabix rows
        return None  # pragma: no cover - overridden where TBI_PRESET set

    def write(self, iterator: Iterator) -> _PartFile:
        if self.bgzf:
            return self._write_bgzf(iterator)
        out = self._part_path()
        n = 0
        with open(out, "w", encoding="utf-8", newline="\n") as f:
            head = self._head()
            if head:
                f.write(head)
            for row in iterator:
                f.write(self._line(row.asDict()))
                n += 1
        return _PartFile(out, n)

    def _write_bgzf(self, iterator: Iterator) -> _PartFile:
        from oxbow_spark.sources.align_write import (
            BGZF_EOF,
            _BgzfStreamWriter,
            bgzf_compress,
        )

        out = self._part_path()
        tbi = None
        if self.index_kind == "tbi":
            tbi = _TbiBuilder(self.TBI_PRESET)
        elif self.index_kind == "csi":
            tbi = _CsiTabixBuilder(
                self.TBI_PRESET,
                min_shift=int(self.options.get("csi_min_shift", 14)),
                depth=int(self.options.get("csi_depth", 5)))
        n = 0
        with open(out, "wb") as f:
            w = _BgzfStreamWriter(f)
            w.write(self._head().encode("utf-8"))
            # header block-aligned: parts raw-copy concatenable
            # (sources/cat.py:cat_bgzf_text)
            w.flush()
            for row in iterator:
                d = row.asDict()
                vstart = w.vtell()
                w.write(self._line(d).encode("utf-8"))
                n += 1
                if tbi is not None:
                    chrom, beg0, end0 = self._interval(d)
                    tbi.add(str(chrom), beg0, end0, vstart, w.vtell())
            w.close()
            f.write(BGZF_EOF)
        if tbi is not None:
            ext = "." + self.index_kind
            with open(out + ext, "wb") as fi:
                fi.write(bgzf_compress(tbi.serialize()) + BGZF_EOF)
        return _PartFile(out, n)


# --------------------------------------------------------------------- VCF

def _fmt_scalar(v) -> str:
    if v is None:
        return "."
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        # shortest exact decimal (Python repr): value-lossless round-trip
        # even through float32 INFO columns
        return repr(v)
    return str(v)


def _fmt_list(v, sep: str) -> str:
    if v is None:
        return "."
    if isinstance(v, (list, tuple)):
        if not v:
            return "."
        return sep.join(_fmt_scalar(x) for x in v)
    return _fmt_scalar(v)


def render_gt(gt) -> str:
    """Inverse of `models/vcf_header.py:parse_gt`: (allele, phased) struct
    → '0|1'-style string, leading-phase preserved."""
    if gt is None:
        return "."
    d = gt if isinstance(gt, dict) else gt.asDict()
    alleles, phased = d.get("allele"), d.get("phased")
    if not alleles:
        return "."
    out = []
    for i, a in enumerate(alleles):
        ph = bool(phased[i]) if phased and i < len(phased) else False
        if i > 0 or ph:
            out.append("|" if ph else "/")
        out.append("." if a is None else str(a))
    return "".join(out)


class VcfWriter(_TextPartWriter):
    SUFFIX = ".vcf"
    TBI_PRESET = (2, 1, 2, 0, "#")  # tabix VCF preset

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        text = options.get("header")
        if not text:
            raise ValueError(
                "the vcf writer requires a `header` option (full VCF header "
                "text: ##fileformat/##INFO/##FORMAT/#CHROM lines)")
        self.header_text = text
        self.hdr = VcfHeader.parse(
            [ln for ln in text.splitlines() if ln.startswith("#")])

    def _interval(self, d: dict):
        beg0 = int(d["pos"]) - 1
        return d["chrom"], beg0, beg0 + len(d.get("ref") or "x")

    def _head(self) -> str:
        return "".join(
            ln.rstrip("\n") + "\n"
            for ln in self.header_text.splitlines() if ln.strip())

    def _info_str(self, info) -> str:
        if info is None:
            return "."
        d = info if isinstance(info, dict) else info.asDict()
        parts = []
        for de in self.hdr.infos:
            v = d.get(de.name)
            if v is None or v is False:
                continue
            if de.is_flag:
                parts.append(de.name)
            elif isinstance(v, (list, tuple)):
                if len(v) == 1 and v[0] is None:
                    # inverse of parse: 'k=' (empty value) → [None]; 'k=.'
                    # and absent both → None (key omitted)
                    parts.append(f"{de.name}=")
                else:
                    parts.append(f"{de.name}={_fmt_list(v, ',')}")
            else:
                parts.append(f"{de.name}={_fmt_scalar(v)}")
        return ";".join(parts) or "."

    def _sample_str(self, s, keys) -> str:
        if s is None:
            return "."
        d = s if isinstance(s, dict) else s.asDict()
        out = []
        for k in keys:
            v = d.get(k)
            if k == "GT":
                out.append(render_gt(v))
            elif isinstance(v, (list, tuple)):
                out.append(_fmt_list(v, ","))
            else:
                out.append(_fmt_scalar(v))
        while len(out) > 1 and out[-1] == ".":
            out.pop()  # htslib-style trailing-missing truncation
        return ":".join(out)

    def _line(self, d: dict) -> str:
        cols = [
            str(d.get("chrom", ".")),
            _fmt_scalar(d.get("pos")),
            _fmt_list(d.get("id"), ";"),
            d.get("ref") or ".",
            _fmt_list(d.get("alt"), ","),
            _fmt_scalar(d.get("qual")),
            # FILTER inverts parse_filter: [] ⇄ PASS, None ⇄ '.'
            ("." if d.get("filter") is None
             else "PASS" if not list(d["filter"])
             else ";".join(d["filter"])),
            self._info_str(d.get("info")),
        ]
        samples = [s for s in self.hdr.samples if s in d]
        if samples:
            # FORMAT keys: header order with GT first (spec §1.6.2)
            keys = [de.name for de in self.hdr.formats]
            if "GT" in keys:
                keys.remove("GT")
                keys.insert(0, "GT")
            cols.append(":".join(keys))
            cols.extend(self._sample_str(d[s], keys) for s in samples)
        return "\t".join(cols) + "\n"


class _TbiBuilder:
    """Tabix (.tbi) accumulator for VCF output: the BAI binning/linear
    structures (`align_write._BaiBuilder`) plus the tabix header —
    the format preset (VCF: format=2 seq/beg cols 1/2; BED: BED-style
    flag 0x10000 cols 1/2/3), names in order of first appearance. The
    serialized payload is itself BGZF-compressed by the caller (tabix
    files are BGZF)."""

    def __init__(self, preset: tuple[int, int, int, int, str]):
        from oxbow_spark.sources.align_write import _BaiBuilder

        self.preset = preset
        self.names: list[str] = []
        self.ids: dict[str, int] = {}
        self.bai = _BaiBuilder(0)

    def add(self, chrom: str, beg0: int, end0: int,
            vstart: int, vend: int) -> None:
        rid = self.ids.get(chrom)
        if rid is None:
            rid = self.ids[chrom] = len(self.names)
            self.names.append(chrom)
            self.bai.n_ref += 1
            self.bai.bins.append({})
            self.bai.linear.append({})
        self.bai.add(rid, beg0, end0, vstart, vend)

    def serialize(self) -> bytes:
        import struct

        fmt, cs, cb, ce, meta = self.preset
        body = self.bai.serialize()[8:]  # strip BAI magic + n_ref
        nm = b"".join(n.encode("ascii") + b"\x00" for n in self.names)
        head = b"TBI\x01" + struct.pack(
            "<8i", len(self.names), fmt, cs, cb, ce, ord(meta), 0, len(nm))
        return head + nm + body


class _CsiTabixBuilder:
    """Tabix-flavoured CSI (.csi) accumulator for BGZF text output: the
    generalized-depth CSI binning (`align_write._CsiBuilder`) carrying
    the tabix preset + sequence-name dictionary in the CSI aux blob —
    the layout `bgzf.CsiIndex.read` (and htslib) expects. Unlike .tbi
    (BAI's fixed 14/5 binning, 2^29-1 position cap), depth>5 indexes
    long contigs. Serialized payload must be BGZF-compressed by the
    caller."""

    def __init__(self, preset: tuple[int, int, int, int, str],
                 min_shift: int = 14, depth: int = 5):
        from oxbow_spark.sources.align_write import _CsiBuilder

        self.preset = preset
        self.names: list[str] = []
        self.ids: dict[str, int] = {}
        self.csi = _CsiBuilder(0, min_shift, depth)

    def add(self, chrom: str, beg0: int, end0: int,
            vstart: int, vend: int) -> None:
        rid = self.ids.get(chrom)
        if rid is None:
            rid = self.ids[chrom] = len(self.names)
            self.names.append(chrom)
            self.csi.n_ref += 1
            self.csi.bins.append({})
            self.csi.linear.append({})
            self.csi.counts.append([0, 0, -1, -1])
        self.csi.add(rid, beg0, end0, vstart, vend)

    def serialize(self) -> bytes:
        import struct

        fmt, cs, cb, ce, meta = self.preset
        nm = b"".join(n.encode("ascii") + b"\x00" for n in self.names)
        self.csi.aux = struct.pack(
            "<7i", fmt, cs, cb, ce, ord(meta), 0, len(nm)) + nm
        return self.csi.serialize()


# --------------------------------------------------------------------- BED

class BedWriter(_TextPartWriter):
    SUFFIX = ".bed"
    TBI_PRESET = (0x10000, 1, 2, 3, "#")  # tabix BED preset (0-based)

    def _interval(self, d: dict):
        return d["chrom"], int(d["start"]), int(d["end"])

    def _line(self, d: dict) -> str:
        out = []
        for nm in ("chrom", "start", "end", "name", "score", "strand",
                   "thickStart", "thickEnd", "itemRgb", "blockCount",
                   "blockSizes", "blockStarts"):
            if nm not in d:
                continue
            v = d[nm]
            if v is None:
                out.append("0" if nm == "itemRgb" else ".")
            elif nm == "itemRgb":
                out.append(",".join(str(x) for x in v))
            elif isinstance(v, (list, tuple)):
                out.append(",".join(str(x) for x in v))
            else:
                out.append(str(v))
        # custom tail columns (bedN+m / rest) in row order after standards
        for nm, v in d.items():
            if nm in ("chrom", "start", "end", "name", "score", "strand",
                      "thickStart", "thickEnd", "itemRgb", "blockCount",
                      "blockSizes", "blockStarts"):
                continue
            out.append("." if v is None else str(v))
        return "\t".join(out) + "\n"


# --------------------------------------------------------------------- GXF

class GxfWriter(_TextPartWriter):
    """GTF/GFF writer: 8 standard columns + the attributes column.

    Attributes come from the scan's ``attributes`` struct when present
    (rendered per flavor: GTF ``key "value"; ``, GFF3
    ``key=value`` with %-escaping — the inverse of
    `models/gxf.py:parse_attributes` for scanned keys; unscanned keys are
    not in the struct and so cannot round-trip — scan with
    ``attributes='scan'`` for full fidelity on known keys). Without the
    struct, the attribute column renders '.'."""

    FLAVOR = "gtf"
    # tabix generic preset: seq col 1, 1-based start col 4, end col 5
    TBI_PRESET = (0, 1, 4, 5, "#")

    def _interval(self, d: dict):
        return d.get("seqid", "."), int(d.get("start", 1)) - 1, \
            int(d.get("end", 0))

    def _attr_str(self, attrs) -> str:
        if attrs is None:
            return "."
        d = attrs if isinstance(attrs, dict) else attrs.asDict()
        parts = []
        for k, v in d.items():
            if v is None:
                continue
            vals = v if isinstance(v, (list, tuple)) else [v]
            if self.FLAVOR == "gtf":
                parts.extend(f'{k} "{x}";' for x in vals)
            else:
                from urllib.parse import quote

                enc = ",".join(quote(str(x), safe=" :^*$@!+?|") for x in vals)
                parts.append(f"{k}={enc}")
        if not parts:
            return "."
        return " ".join(parts) if self.FLAVOR == "gtf" else ";".join(parts)

    def _line(self, d: dict) -> str:
        score = d.get("score")
        return "\t".join((
            str(d.get("seqid", ".")),
            d.get("source") or ".",
            d.get("type") or ".",
            str(d.get("start", 0)),
            str(d.get("end", 0)),
            "." if score is None else repr(float(score)),
            d.get("strand") or ".",
            "." if d.get("frame") is None else str(d["frame"]),
            self._attr_str(d.get("attributes")),
        )) + "\n"


class GtfWriter(GxfWriter):
    FLAVOR = "gtf"
    SUFFIX = ".gtf"


class GffWriter(GxfWriter):
    FLAVOR = "gff"
    SUFFIX = ".gff"


# ------------------------------------------------------------ FASTA/FASTQ

class FastaWriter(_TextPartWriter):
    SUFFIX = ".fasta"
    WRAP = 60
    EXTRA_INDEX_KINDS = ("fai",)

    def _line(self, d: dict) -> str:
        name = d.get("name") or ""
        desc = d.get("description")
        seq = d.get("sequence") or ""
        head = f">{name} {desc}\n" if desc else f">{name}\n"
        body = "\n".join(
            seq[i:i + self.WRAP] for i in range(0, max(len(seq), 1), self.WRAP))
        return head + body + "\n"

    def write(self, iterator: Iterator) -> _PartFile:
        if (self.options.get("index") or "").lower() != "fai":
            return super().write(iterator)
        # index='fai': track byte offsets while writing so the part gets
        # a faidx sidecar — written FASTAs are immediately region-
        # sliceable (regions= option / X12 faidx_fetch). With
        # compression='bgzf' the offsets are UNCOMPRESSED-stream bytes
        # and a bgzip-style .gzi block map is emitted alongside, so the
        # compressed part stays random-access (the reader's
        # faidx_fetch_bgzf path — same contract as `samtools faidx` on
        # bgzipped FASTA).
        out = self._part_path()
        fai: list[str] = []
        pos = 0
        n = 0
        if self.bgzf:
            import struct as _struct

            from oxbow_spark.sources.align_write import (
                BGZF_EOF,
                _BgzfStreamWriter,
            )

            with open(out, "wb") as f:
                w = _BgzfStreamWriter(f, track_blocks=True)
                for row in iterator:
                    d = row.asDict()
                    text = self._line(d)
                    head_len = text.index("\n") + 1
                    seq = d.get("sequence") or ""
                    fai.append(
                        f"{d.get('name') or ''}\t{len(seq)}"
                        f"\t{pos + head_len}\t{self.WRAP}\t{self.WRAP + 1}")
                    b = text.encode("utf-8")
                    w.write(b)
                    pos += len(b)
                    n += 1
                w.close()
                entries = (w.blocks or [])[:-1]  # starts of blocks 1..n-1
                f.write(BGZF_EOF)
            with open(out + ".gzi", "wb") as gz:
                gz.write(_struct.pack("<Q", len(entries)))
                for c, u in entries:
                    gz.write(_struct.pack("<QQ", c, u))
        else:
            with open(out, "w", encoding="utf-8", newline="\n") as f:
                for row in iterator:
                    d = row.asDict()
                    text = self._line(d)
                    head_len = text.index("\n") + 1
                    seq = d.get("sequence") or ""
                    fai.append(
                        f"{d.get('name') or ''}\t{len(seq)}"
                        f"\t{pos + head_len}\t{self.WRAP}\t{self.WRAP + 1}")
                    f.write(text)
                    pos += len(text.encode("utf-8"))
                    n += 1
        with open(out + ".fai", "w", encoding="utf-8", newline="\n") as fi:
            fi.write("\n".join(fai) + ("\n" if fai else ""))
        return _PartFile(out, n)


class FastqWriter(_TextPartWriter):
    SUFFIX = ".fastq"

    def _line(self, d: dict) -> str:
        name = d.get("name") or ""
        desc = d.get("description")
        head = f"@{name} {desc}\n" if desc else f"@{name}\n"
        return (head + (d.get("sequence") or "") + "\n+\n"
                + (d.get("quality") or "") + "\n")
