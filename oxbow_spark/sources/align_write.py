"""Alignment writers: ``df.write.format("sam"/"bam")``.

Beyond the reference (which has no writers): the alignment sources are
also Spark DataSource *writers*, closing the loop for subset/transform
pipelines — read a BAM, filter/mark/annotate with DataFrame ops, write
standard SAM/BAM back out for htslib-world tools.

Distributed layout (the Spark file-sink contract): each task writes one
self-contained part file into the target directory — a complete SAM
(header + records) or BAM (BGZF: header block + record blocks + EOF
marker). Part files are independently valid, so downstream tools can
consume them directly or `samtools cat` them; a 1-partition DataFrame
yields a single conventional file. Rows use this repo's scan conventions
(null ⇄ ``*``/0/255 missing-value mapping, ``rnext`` resolved, 1-based
``pos``), so read → write round-trips are lossless for the standard
columns.

The SAM header comes from the ``header`` option (literal text). BAM
additionally derives its reference dictionary (name → id, lengths) from
the header's @SQ lines — required when any record is mapped.
"""

from __future__ import annotations

import contextlib
import os
import re
import struct
import uuid
import zlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

from oxbow_spark.models.sam_header import SamHeader

# one BGZF block holds at most 64 KiB of compressed payload; cap the
# uncompressed input per block the way htslib does
_BGZF_INPUT = 0xFF00
# fixed 28-byte BGZF EOF marker (SAM spec §4.1.2)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

SEQ_CODES = "=ACMGRSVTWYHKDBN"
_SEQ_NIBBLE = {c: i for i, c in enumerate(SEQ_CODES)}
_CIGAR_OPS = "MIDNSHP=X"
_CIGAR_CODE = {c: i for i, c in enumerate(_CIGAR_OPS)}
_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def bgzf_block(data: bytes) -> bytes:
    """One BGZF block: gzip member with the BC extra subfield carrying
    BSIZE (total block length − 1)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25 + 1  # header(12) + extra(6) + comp + crc+isize(8)
    head = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)            # XLEN
        + b"BC" + struct.pack("<HH", 2, bsize - 1)
    )
    return head + comp + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                                     len(data) & 0xFFFFFFFF)


def bgzf_compress(data: bytes) -> bytes:
    """Whole payload → BGZF block stream (no EOF marker appended)."""
    out = []
    for off in range(0, len(data), _BGZF_INPUT):
        out.append(bgzf_block(data[off:off + _BGZF_INPUT]))
    return b"".join(out)


def reg2bin(beg: int, end: int) -> int:
    """BAI bin for a 0-based half-open interval (SAM spec §5.3)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bin_csi(beg: int, end: int, min_shift: int = 14,
                depth: int = 5) -> int:
    """CSI generalized bin for a 0-based half-open interval (CSIv1 spec
    reg2bin pseudocode); min_shift=14/depth=5 is the BAI instance."""
    end -= 1
    s, t = min_shift, ((1 << (3 * depth)) - 1) // 7
    for level in range(depth, 0, -1):
        if beg >> s == end >> s:
            return t + (beg >> s)
        s += 3
        t -= 1 << (3 * (level - 1))
    return 0


def _get(d: dict, k: str, default=None):
    v = d.get(k)
    return default if v is None else v


def sam_line(d: dict) -> str:
    """Row dict (scan conventions) → one SAM text line."""
    rname = d.get("rname")
    rnext = d.get("rnext")
    if rnext is None:
        rn6 = "*"
    elif rname is not None and rnext == rname:
        rn6 = "="
    else:
        rn6 = rnext
    return "\t".join((
        str(_get(d, "qname", "*")),
        str(_get(d, "flag", 4)),
        rname if rname is not None else "*",
        str(_get(d, "pos", 0)),
        str(_get(d, "mapq", 255)),
        str(_get(d, "cigar", "*")),
        rn6,
        str(_get(d, "pnext", 0)),
        str(_get(d, "tlen", 0)),
        str(_get(d, "seq", "*")),
        str(_get(d, "qual", "*")),
    ))


def encode_bam_record(d: dict, ref_ids: dict[str, int],
                      tags: bytes = b"") -> bytes:
    """Row dict → one framed BAM record (block_size prefix included)."""
    qname = _get(d, "qname", "*")
    flag = int(_get(d, "flag", 4))
    rname = d.get("rname")
    pos1 = d.get("pos")
    mapq = int(_get(d, "mapq", 255))
    cigar = d.get("cigar")
    rnext = d.get("rnext")
    pnext1 = d.get("pnext")
    tlen = int(_get(d, "tlen", 0))
    seq = d.get("seq")
    qual = d.get("qual")

    if rname is not None and rname not in ref_ids:
        raise ValueError(
            f"rname {rname!r} not in the writer header's @SQ lines — pass a "
            "header option whose @SQ dictionary covers every mapped record")
    ref_id = ref_ids[rname] if rname is not None else -1
    pos0 = (pos1 - 1) if pos1 else -1
    next_id = ref_ids.get(rnext, -1) if rnext is not None else -1
    next_pos0 = (pnext1 - 1) if pnext1 else -1

    ops = _CIGAR_RE.findall(cigar) if cigar else []
    reflen = sum(int(n) for n, c in ops if c in "MDN=X")
    bin_ = reg2bin(pos0, pos0 + max(reflen, 1)) if pos0 >= 0 else 4680
    l_seq = len(seq) if seq else 0

    name_b = (qname if qname is not None else "*").encode("ascii") + b"\x00"
    cig_b = b"".join(
        struct.pack("<I", (int(n) << 4) | _CIGAR_CODE[c]) for n, c in ops)
    seq_b = bytearray((l_seq + 1) // 2)
    if seq:
        for i, ch in enumerate(seq):
            nib = _SEQ_NIBBLE.get(ch.upper(), 15)  # unknown → N
            seq_b[i // 2] |= nib << (4 if i % 2 == 0 else 0)
    qual_b = (bytes(min(ord(c) - 33, 93) for c in qual) if qual
              else b"\xff" * l_seq)

    body = struct.pack(
        "<iiBBHHHiiii", ref_id, pos0, len(name_b), mapq, bin_, len(ops),
        flag, l_seq, next_id, next_pos0, tlen,
    ) + name_b + cig_b + bytes(seq_b) + qual_b + tags
    return struct.pack("<I", len(body)) + body


def _parse_tag_defs(opt: str | None) -> list[tuple[str, str]]:
    """'NM:i,MD:Z' (the reader's tag_defs grammar) → [(name, code)]."""
    if not opt:
        return []
    return [tuple(spec.strip().split(":", 1)) for spec in opt.split(",")]


def sam_tags_text(tags, defs: list[tuple[str, str]]) -> str:
    """tags struct row → SAM text tag fields ('NM:i:3\tMD:Z:...')."""
    if tags is None:
        return ""
    d = tags if isinstance(tags, dict) else tags.asDict()
    out = []
    for name, code in defs:
        v = d.get(name)
        if v is None:
            continue
        if code.startswith("B"):
            sub = "f" if code == "Bf" else "i"
            out.append(f"{name}:B:{sub}," + ",".join(
                repr(x) if sub == "f" else str(int(x)) for x in v))
        elif code in "cCsSiI":
            out.append(f"{name}:i:{int(v)}")
        elif code == "f":
            out.append(f"{name}:f:{v!r}")
        else:  # A / Z / H
            out.append(f"{name}:{code}:{v}")
    return ("\t" + "\t".join(out)) if out else ""


def encode_bam_tags(tags, defs: list[tuple[str, str]]) -> bytes:
    """tags struct row → binary BAM tag block. Integers normalize to
    'i' (int32) and integer arrays to 'B,i' — the same normalization the
    scan applies, so read → write → read round-trips the values."""
    if tags is None:
        return b""
    d = tags if isinstance(tags, dict) else tags.asDict()
    out = bytearray()
    for name, code in defs:
        v = d.get(name)
        if v is None:
            continue
        nb = name.encode("ascii")
        if code == "A":
            out += nb + b"A" + str(v)[:1].encode("ascii")
        elif code in "cCsSiI":
            out += nb + b"i" + struct.pack("<i", int(v))
        elif code == "f":
            out += nb + b"f" + struct.pack("<f", float(v))
        elif code in ("Z", "H"):
            out += nb + code.encode() + str(v).encode("ascii") + b"\x00"
        elif code.startswith("B"):
            if code == "Bf":
                out += nb + b"Bf" + struct.pack("<i", len(v))
                out += struct.pack(f"<{len(v)}f", *[float(x) for x in v])
            else:
                out += nb + b"Bi" + struct.pack("<i", len(v))
                out += struct.pack(f"<{len(v)}i", *[int(x) for x in v])
        else:
            raise ValueError(f"unsupported tag code {code!r} for {name}")
    return bytes(out)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


MANIFEST = "_parts.manifest"


@contextlib.contextmanager
def _manifest_lock(path: str):
    """Serialize shared-manifest read-modify-write: the manifest is
    format-SHARED across writers cohabiting one directory, and two
    concurrent commits' unlocked RMW could interleave and silently
    drop the other format's lines (making its parts invisible to the
    manifest-preferring `committed_parts`). Advisory `flock` on a
    sidecar lockfile — commit runs on the driver, and the manifest
    protocol already assumes a driver-visible local/posix filesystem;
    degrades to a no-op where fcntl is unavailable."""
    try:
        import fcntl
    except ImportError:  # non-POSIX: preserve prior (unlocked) behavior
        yield
        return
    os.makedirs(path, exist_ok=True)
    fd = os.open(os.path.join(path, MANIFEST + ".lock"),
                 os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)

#: sidecar index extensions the writers emit next to part files
#: (part-X.bam.bai and friends) — used to recognise a DANGLING sidecar
#: whose parent part is already gone; live sidecars are recognised by
#: their parent being present in the directory
_INDEX_EXTS = frozenset({"bai", "csi", "tbi", "crai", "gzi", "fai"})


def _prepare_dir(path: str, overwrite: bool, suffix: str) -> None:
    os.makedirs(path, exist_ok=True)
    if not overwrite:
        return
    for f in os.listdir(path):
        if f.endswith(suffix):
            os.remove(os.path.join(path, f))
    # strip only THIS suffix's lines from a shared manifest — deleting
    # the whole file would make cohabiting formats' parts invisible to
    # committed_parts(), which prefers the manifest whenever present
    man = os.path.join(path, MANIFEST)
    with _manifest_lock(path):
        if os.path.exists(man):
            with open(man, "r", encoding="ascii") as fh:
                keep = [ln.strip() for ln in fh
                        if ln.strip() and not ln.strip().endswith(suffix)]
            if keep:
                with open(man, "w", encoding="ascii") as fh:
                    fh.writelines(n + "\n" for n in keep)
            else:
                os.remove(man)


def _reconcile_parts(path: str, messages, fresh: bool = True,
                     suffix: str | None = None) -> list[str]:
    """Commit-time reconciliation shared by every part-file writer.

    A retried or speculative task attempt may have fully written its
    part file (uuid suffix keeps attempts collision-free) and then
    lost the commit race — `abort()` only runs on JOB failure, so the
    orphan survives next to the winning attempt's file and a naive
    ``sorted(glob('part-*'))`` splice would silently duplicate
    records. Keep exactly the parts named by the task commit messages
    (plus their ``<part>.<ext>`` sidecar indexes), delete every other
    ``part-*`` entry OF THIS WRITER'S ``suffix`` (mirroring
    `_prepare_dir`'s suffix scope — part files of a different format
    cohabiting the directory are never touched), and record the
    committed parts in NUMERIC partition order in ``_parts.manifest``
    so downstream splicing never trusts a lexicographic directory
    listing (``part-100000`` sorts between ``part-09999`` and
    ``part-10000`` lexically).

    ``fresh=False`` (append mode: the dir may hold parts from earlier
    writes this run cannot tell from orphans) skips deletion and
    merges the new names onto the existing manifest; when no manifest
    exists yet (parts written before the manifest feature, or by a
    writer that never committed one), the manifest is seeded from the
    numeric-sorted glob of pre-existing part DATA files of every
    suffix first, so the manifest taking precedence over the glob
    fallback in `committed_parts` cannot silently drop earlier data —
    neither this writer's nor a cohabiting format's.

    The manifest is SHARED across formats cohabiting one directory:
    both modes carry prior manifest lines (or the glob seed) that do
    not match this writer's suffix through to the rewritten manifest,
    so a fresh commit of one format never makes another format's
    parts invisible to the manifest-preferring `committed_parts`.

    Returns this writer's committed part paths in partition order."""
    import re

    committed = [m.path for m in messages if m is not None]
    keep = {os.path.basename(p) for p in committed}
    listing = os.listdir(path)
    present = set(listing)

    def _is_sidecar(f: str) -> bool:
        # part-X.<fmt>.<idx>: a LIVE sidecar's stem names its parent
        # part file in this directory; a dangling one (parent already
        # reaped) is recognised by a known index extension
        stem, _, ext = f.rpartition(".")
        if not ext or not stem.startswith("part-"):
            return False
        return stem in present or ext in _INDEX_EXTS

    def _mine(f: str) -> bool:
        # this writer's part files (and their sidecar indexes) only
        if not f.startswith("part-"):
            return False
        if suffix is None:
            return True
        if f.endswith(suffix):
            return True
        # sidecar of this suffix only — a bare stem.endswith(suffix)
        # would also claim DATA files of a writer whose suffix extends
        # this one (.vcf vs .vcf.gz) as deletable orphans
        stem, _, _ext = f.rpartition(".")
        return stem.endswith(suffix) and _is_sidecar(f)

    if fresh:
        for f in listing:
            if not _mine(f) or f in keep:
                continue
            if any(f.startswith(k + ".") for k in keep):
                continue  # sidecar index of a committed part
            try:
                os.remove(os.path.join(path, f))
            except FileNotFoundError:
                pass

    def _pid(p: str):
        m = re.match(r"part-(\d+)-", os.path.basename(p))
        return (int(m.group(1)) if m else 1 << 30, os.path.basename(p))

    names = [os.path.basename(p) for p in sorted(committed, key=_pid)]
    man = os.path.join(path, MANIFEST)
    # the read-carry-write below is a shared-manifest RMW — hold the
    # lock across it so a cohabiting format's concurrent commit cannot
    # interleave and lose lines (`_manifest_lock`)
    with _manifest_lock(path):
        if os.path.exists(man):
            prior_all = True  # manifest lines are authoritative
            with open(man, "r", encoding="ascii") as f:
                prior = [ln.strip() for ln in f if ln.strip()]
        else:
            # pre-manifest parts: seed from the glob of part DATA
            # files of EVERY suffix (sidecar indexes are excluded —
            # they are found through their parent part, never spliced
            # directly), so the manifest this commit creates cannot
            # hide earlier data — neither this writer's appends nor a
            # cohabiting format's
            prior_all = False
            prior = sorted(
                (f for f in os.listdir(path)
                 if f.startswith("part-") and f not in keep
                 and not _is_sidecar(f)),
                key=_pid)
        if fresh:
            # carry only OTHER formats' lines through a fresh commit
            # (this writer's old lines are replaced wholesale; their
            # files were reaped by _prepare_dir / the orphan pass
            # above) — and only lines whose file still exists
            prior = [n for n in prior
                     if suffix is not None and not n.endswith(suffix)
                     and os.path.exists(os.path.join(path, n))]
        elif not prior_all:
            prior = [n for n in prior
                     if os.path.exists(os.path.join(path, n))]
        names = prior + [n for n in names if n not in set(prior)]
        with open(man, "w", encoding="ascii") as f:
            for n in names:
                f.write(n + "\n")
    return [os.path.join(path, n) for n in names]


def committed_parts(path: str, suffix: str) -> list[str]:
    """Part files of one write, in partition order: the commit-time
    manifest when present (exactly the committed attempts), else a
    numeric-partition-id sort of the directory glob."""
    import glob as _glob
    import re

    man = os.path.join(path, MANIFEST)
    if os.path.exists(man):
        with open(man, "r", encoding="ascii") as f:
            names = [ln.strip() for ln in f if ln.strip()]
        return [os.path.join(path, n) for n in names if n.endswith(suffix)]

    def _pid(p: str):
        m = re.match(r"part-(\d+)-", os.path.basename(p))
        return (int(m.group(1)) if m else 1 << 30, os.path.basename(p))

    return sorted(_glob.glob(os.path.join(path, f"part-*{suffix}")),
                  key=_pid)


class _AlignmentWriter(DataSourceWriter):
    SUFFIX = ""

    def __init__(self, options: dict, overwrite: bool):
        self.options = dict(options)
        self.path = options.get("path")
        if not self.path:
            raise ValueError("writer needs a target path")
        self.header_text = options.get("header") or "@HD\tVN:1.6"
        self._overwrite = bool(overwrite)
        _prepare_dir(self.path, overwrite, self.SUFFIX)

    def _part_path(self) -> str:
        # partition id first (Spark's own part-file convention);
        # committed_parts() orders NUMERICALLY on it, so with
        # range-partitioned input the cat_* splice is globally
        # sorted; the uuid tail keeps retried tasks collision-free
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        return os.path.join(
            self.path,
            f"part-{pid:05d}-{uuid.uuid4().hex[:12]}{self.SUFFIX}")

    def commit(self, messages) -> None:
        _reconcile_parts(self.path, messages, fresh=self._overwrite,
                         suffix=self.SUFFIX)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SamWriter(_AlignmentWriter):
    SUFFIX = ".sam"

    def write(self, iterator: Iterator) -> _PartFile:
        out = self._part_path()
        defs = _parse_tag_defs(self.options.get("tag_defs"))
        n = 0
        with open(out, "w", encoding="ascii", newline="\n") as f:
            for line in self.header_text.splitlines():
                if line.strip():
                    f.write(line.rstrip("\n") + "\n")
            for row in iterator:
                d = row.asDict()
                f.write(sam_line(d)
                        + sam_tags_text(d.get("tags"), defs) + "\n")
                n += 1
        return _PartFile(out, n)


class BamWriter(_AlignmentWriter):
    SUFFIX = ".bam"

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        hdr = SamHeader.parse(self.header_text.splitlines())
        self.ref_names = hdr.chrom_names
        self.ref_sizes = hdr.chrom_sizes
        self.ref_ids = {nm: i for i, nm in enumerate(self.ref_names)}

    def _header_block(self) -> bytes:
        text = "".join(
            ln.rstrip("\n") + "\n"
            for ln in self.header_text.splitlines() if ln.strip())
        tb = text.encode("ascii")
        out = [b"BAM\x01", struct.pack("<i", len(tb)), tb,
               struct.pack("<i", len(self.ref_names))]
        for nm in self.ref_names:
            nb = nm.encode("ascii") + b"\x00"
            out.append(struct.pack("<i", len(nb)))
            out.append(nb)
            out.append(struct.pack("<i", self.ref_sizes.get(nm, 0)))
        return b"".join(out)

    def write(self, iterator: Iterator) -> _PartFile:
        out = self._part_path()
        kind = (self.options.get("index") or "").lower()
        if kind not in ("", "bai", "csi"):
            raise ValueError(f"bam writer: unknown index kind {kind!r}")
        defs = _parse_tag_defs(self.options.get("tag_defs"))
        n = 0
        with open(out, "wb") as f:
            w = _BgzfStreamWriter(f)
            w.write(self._header_block())
            # header gets its own block(s): parts become raw-copy
            # concatenable (samtools-cat class merge, sources/cat.py)
            w.flush()
            bai = None
            if kind == "bai":
                bai = _BaiBuilder(len(self.ref_names))
            elif kind == "csi":
                min_shift = int(self.options.get("csi_min_shift", 14))
                depth = int(self.options.get(
                    "csi_depth",
                    csi_depth_for(max(self.ref_sizes.values(), default=0),
                                  min_shift)))
                bai = _CsiBuilder(len(self.ref_names), min_shift, depth)
            for row in iterator:
                d = row.asDict()
                vstart = w.vtell()
                w.write(encode_bam_record(d, self.ref_ids,
                                          tags=encode_bam_tags(
                                              d.get("tags"), defs)))
                n += 1
                if bai is not None:
                    mapped = not (int(d.get("flag") or 0) & 4)
                    if d.get("rname") is not None and d.get("pos"):
                        rid = self.ref_ids[d["rname"]]
                        pos0 = d["pos"] - 1
                        cig = d.get("cigar")
                        reflen = (sum(int(m)
                                      for m, c in _CIGAR_RE.findall(cig)
                                      if c in "MDN=X") if cig else 0)
                        bai.add(rid, pos0, pos0 + max(reflen, 1),
                                vstart, w.vtell())
                        bai.tally(rid, mapped, vstart, w.vtell())
                    else:
                        bai.tally(None, mapped)
            w.close()
            f.write(BGZF_EOF)
        if kind == "bai":
            with open(out + ".bai", "wb") as fi:
                fi.write(bai.serialize())
        elif kind == "csi":
            with open(out + ".csi", "wb") as fi:
                fi.write(bgzf_compress(bai.serialize()) + BGZF_EOF)
        return _PartFile(out, n)


class _BgzfStreamWriter:
    """Stateful BGZF writer with record-addressable virtual offsets:
    ``vtell()`` before/after a ``write`` gives the (compressed block
    offset << 16 | within-block offset) coordinates the BAI carries.
    Input chunks at the fixed htslib block payload size."""

    def __init__(self, f, track_blocks: bool = False):
        self.f = f
        self.coff = 0          # compressed bytes emitted so far
        self.uoff = 0          # uncompressed bytes flushed so far
        self.pend = bytearray()  # uncompressed bytes not yet in a block
        # (compressed, uncompressed) offsets AFTER each flushed block —
        # i.e. the start offsets of blocks 1..n: the bgzip .gzi entries
        self.blocks: list[tuple[int, int]] | None = \
            [] if track_blocks else None

    def vtell(self) -> int:
        return (self.coff << 16) | len(self.pend)

    def write(self, data: bytes) -> None:
        self.pend += data
        while len(self.pend) >= _BGZF_INPUT:
            self._flush_block(self.pend[:_BGZF_INPUT])
            del self.pend[:_BGZF_INPUT]

    def _flush_block(self, chunk) -> None:
        blk = bgzf_block(bytes(chunk))
        self.f.write(blk)
        self.coff += len(blk)
        self.uoff += len(chunk)
        if self.blocks is not None:
            self.blocks.append((self.coff, self.uoff))

    def flush(self) -> None:
        """Force the pending bytes into their own block (header/record
        boundary alignment — what makes written parts raw-copy
        concatenable by `sources/cat.py:cat_bam`)."""
        if self.pend:
            self._flush_block(self.pend)
            self.pend.clear()

    def close(self) -> None:
        if self.pend:
            self._flush_block(self.pend)
            self.pend.clear()


class _BaiBuilder:
    """BAI accumulator: per-reference binning chunks + 16 Kb linear
    index (SAM spec §5.2). Assumes coordinate-grouped input per
    reference (the `samtools index` precondition); adjacent chunks in a
    bin merge when contiguous."""

    def __init__(self, n_ref: int):
        self.n_ref = n_ref
        self.bins: list[dict[int, list[list[int]]]] = [
            {} for _ in range(n_ref)]
        self.linear: list[dict[int, int]] = [{} for _ in range(n_ref)]
        # idxstats metadata: per-ref [n_mapped, n_unmapped, voff_lo,
        # voff_hi] + the no-coordinate record count
        self.counts: list[list[int]] = [
            [0, 0, -1, -1] for _ in range(n_ref)]
        self.n_no_coor = 0

    def tally(self, ref_id: int | None, mapped: bool,
              vstart: int = -1, vend: int = -1) -> None:
        """Count a record for the metadata pseudo-bin (samtools
        idxstats): placed records tally per-ref mapped/unmapped and
        extend the ref's voffset envelope; coordinate-less records
        (ref_id None) go to the trailing n_no_coor."""
        if ref_id is None:
            self.n_no_coor += 1
            return
        c = self.counts[ref_id]
        c[0 if mapped else 1] += 1
        if vstart >= 0:
            c[2] = vstart if c[2] < 0 else min(c[2], vstart)
            c[3] = max(c[3], vend)

    def _meta_chunks(self, r: int) -> bytes:
        if r >= len(self.counts):  # dynamically-grown refs (tabix path)
            return b""
        c = self.counts[r]
        if c[0] == 0 and c[1] == 0:
            return b""
        return (struct.pack("<QQ", max(c[2], 0), max(c[3], 0))
                + struct.pack("<QQ", c[0], c[1]))

    def add(self, ref_id: int, beg0: int, end0: int,
            vstart: int, vend: int) -> None:
        if end0 > (1 << 29):
            raise ValueError(
                f"position {end0} exceeds the BAI 2^29-1 limit; "
                "write with index='csi' for long contigs")
        b = reg2bin(beg0, end0)
        chunks = self.bins[ref_id].setdefault(b, [])
        if chunks and chunks[-1][1] == vstart:
            chunks[-1][1] = vend  # contiguous records extend the chunk
        else:
            chunks.append([vstart, vend])
        lin = self.linear[ref_id]
        for w in range(beg0 >> 14, ((max(end0, beg0 + 1) - 1) >> 14) + 1):
            if w not in lin or vstart < lin[w]:
                lin[w] = vstart

    def serialize(self) -> bytes:
        out = [b"BAI\x01", struct.pack("<i", self.n_ref)]
        for r in range(self.n_ref):
            bins = self.bins[r]
            meta = self._meta_chunks(r)
            out.append(struct.pack("<i", len(bins) + (1 if meta else 0)))
            for b in sorted(bins):
                chunks = bins[b]
                out.append(struct.pack("<iI", b, len(chunks)))
                for s, e in chunks:
                    out.append(struct.pack("<QQ", s, e))
            if meta:  # pseudo-bin 37450: voffset envelope + counts
                out.append(struct.pack("<iI", 37450, 2) + meta)
            lin = self.linear[r]
            n_intv = (max(lin) + 1) if lin else 0
            out.append(struct.pack("<i", n_intv))
            filled = 0
            for w in range(n_intv):
                filled = lin.get(w, filled)
                out.append(struct.pack("<Q", lin.get(w, filled)))
        out.append(struct.pack("<Q", self.n_no_coor))
        return b"".join(out)


def csi_depth_for(max_len: int, min_shift: int = 14) -> int:
    """Smallest CSI depth (≥5 for BAI parity) whose capacity
    ``2^(min_shift + 3·depth)`` covers positions up to ``max_len``."""
    depth = 5
    while max_len > (1 << (min_shift + 3 * depth)):
        depth += 1
    return depth


class _CsiBuilder:
    """CSI (.csi, CSIv1 spec) accumulator: generalized-depth binning
    chunks plus per-bin ``loffset`` virtual-position lower bounds in
    place of BAI's serialized linear index. Capacity is
    ``2^(min_shift + 3·depth)`` — depth>5 indexes the T2T-scale contigs
    BAI cannot (its 2^29-1 cap). The reference consumes CSI everywhere
    on the read path (`oxbow/src/util/index.rs:119-178`); this closes
    the write side. Assumes coordinate-grouped input per reference
    (the `samtools index` precondition).

    loffset semantics match htslib: a linear min-voffset window table at
    ``min_shift`` granularity is kept during accumulation (covering
    *spanning* records, not just bin-assigned ones) and each serialized
    bin's loffset is the forward-filled window value at the bin's first
    position — so a reader pruning to ``loffset(deepest bin ∋ beg)``
    never skips a long record that starts earlier but overlaps ``beg``.
    The serialized payload must be BGZF-compressed by the caller (CSI
    files are BGZF)."""

    def __init__(self, n_ref: int, min_shift: int = 14, depth: int = 5,
                 aux: bytes = b""):
        self.n_ref = n_ref
        self.min_shift = min_shift
        self.depth = depth
        self.aux = aux
        self.capacity = 1 << (min_shift + 3 * depth)
        self.bins: list[dict[int, list[list[int]]]] = [
            {} for _ in range(n_ref)]
        self.linear: list[dict[int, int]] = [{} for _ in range(n_ref)]
        self.counts: list[list[int]] = [
            [0, 0, -1, -1] for _ in range(n_ref)]
        self.n_no_coor = 0

    # idxstats metadata accumulators — same contract as _BaiBuilder
    tally = _BaiBuilder.tally
    _meta_chunks = _BaiBuilder._meta_chunks

    def add(self, ref_id: int, beg0: int, end0: int,
            vstart: int, vend: int) -> None:
        if end0 > self.capacity:
            raise ValueError(
                f"position {end0} exceeds CSI capacity "
                f"2^({self.min_shift}+3*{self.depth}); raise csi_depth")
        b = reg2bin_csi(beg0, end0, self.min_shift, self.depth)
        chunks = self.bins[ref_id].setdefault(b, [])
        if chunks and chunks[-1][1] == vstart:
            chunks[-1][1] = vend
        else:
            chunks.append([vstart, vend])
        lin = self.linear[ref_id]
        sh = self.min_shift
        for w in range(beg0 >> sh, ((max(end0, beg0 + 1) - 1) >> sh) + 1):
            if w not in lin or vstart < lin[w]:
                lin[w] = vstart

    def _bin_first_window(self, b: int) -> int:
        """First min_shift-granularity window covered by bin ``b``."""
        for level in range(self.depth, -1, -1):
            t = ((1 << (3 * level)) - 1) // 7
            if b >= t:
                return (b - t) << (3 * (self.depth - level))
        return 0

    def serialize(self) -> bytes:
        out = [b"CSI\x01",
               struct.pack("<3i", self.min_shift, self.depth,
                           len(self.aux)),
               self.aux, struct.pack("<i", self.n_ref)]
        # htslib META_BIN(idx) = n_bins + 1 (37450 at depth 5) — one past
        # the interval-bin limit, so samtools idxstats reads the counts
        meta_bin = ((1 << (3 * (self.depth + 1))) - 1) // 7 + 1
        for r in range(self.n_ref):
            bins = self.bins[r]
            lin = self.linear[r]
            meta = (self._meta_chunks(r)
                    if r < len(self.counts) else b"")
            # forward-filled linear table for loffset lookups
            n_win = (max(lin) + 1) if lin else 0
            filled: list[int] = []
            cur = 0
            for w in range(n_win):
                cur = lin.get(w, cur)
                filled.append(cur)
            out.append(struct.pack("<i", len(bins) + (1 if meta else 0)))
            for b in sorted(bins):
                w = self._bin_first_window(b)
                loff = filled[min(w, n_win - 1)] if n_win else 0
                chunks = bins[b]
                out.append(struct.pack("<IQi", b, loff, len(chunks)))
                for s, e in chunks:
                    out.append(struct.pack("<QQ", s, e))
            if meta:  # metadata pseudo-bin: voffset envelope + counts
                out.append(struct.pack("<IQi", meta_bin, 0, 2) + meta)
        out.append(struct.pack("<Q", self.n_no_coor))
        return b"".join(out)
