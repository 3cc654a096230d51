"""Minimal BigWig writer: ``df.write.format("bigwig")``.

Beyond the reference (no writers). Emits spec-conformant BigWig part
files (kent bbiFile layout, version 4, little-endian, uncompressed,
zoomLevels=0): common header → total summary → chromosome B+ tree
(single leaf) → bedGraph data sections → R-tree index (single leaf
node). Readable by this repo's `BbiFile` scan — full and region-pruned
— and by kent/htslib-world consumers that accept zoom-less files
(`bigWigInfo`, pyBigWig). One self-contained file per task, the same
distributed contract as the other writers.

Layout choices and limits (documented, not silent):
- bedGraph sections (type 1), ``items_per_slot`` rows per section
  (default 512), one section never spans chromosomes;
- single-leaf trees bound a part file to 65535 chromosomes and 65535
  sections (u16 node counts) — raise ``items_per_slot`` or partition
  count for more;
- chromosome sizes come from the ``chrom_sizes`` option
  ("chr1:248956422,chr2:242193529") or default to each chromosome's max
  interval end seen in the part.
"""

from __future__ import annotations

import os
import shutil
import struct
from typing import Iterator

from oxbow_spark.sources.align_write import _AlignmentWriter, _PartFile

_BW_MAGIC = 0x888FFC26
_BB_MAGIC = 0x8789F2EB
_CHROM_TREE_MAGIC = 0x78CA8C91
_RTREE_MAGIC = 0x2468ACE0


def _chrom_tree(names: list[str], sizes: dict[str, int]) -> bytes:
    key_size = max((len(n) for n in names), default=1)
    head = struct.pack("<IIIIQQ", _CHROM_TREE_MAGIC, max(len(names), 1),
                       key_size, 8, len(names), 0)
    leaf = struct.pack("<BBH", 1, 0, len(names))
    items = []
    for cid, nm in enumerate(sorted(names)):
        items.append(nm.encode("ascii").ljust(key_size, b"\x00")
                     + struct.pack("<II", names.index(nm), sizes[nm]))
    return head + leaf + b"".join(items)


class _SectionSpool:
    """Task-local spool for data sections: bodies stream to a temp file
    as they are cut; only (cid, lo, hi, rel_off, size) stays in memory —
    the writer's working set becomes O(index), not O(part). The final
    file assembly copies the spool into place behind the header/tree and
    resolves absolute offsets from the recorded relative ones."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "wb")
        self.meta: list[tuple[int, int, int, int, int]] = []
        self.rel = 0

    def add(self, cid: int, lo: int, hi: int, body: bytes) -> None:
        self.meta.append((cid, lo, hi, self.rel, len(body)))
        self.f.write(body)
        self.rel += len(body)

    def close(self) -> None:
        self.f.close()

    def sections_meta(self, data_base: int):
        """((cid, lo, hi, None) section tuples, absolute offsets) in the
        shape `_rtree` expects — bodies stay on disk."""
        secs = [(c, lo, hi, b"") for c, lo, hi, _o, _n in self.meta]
        offs = [data_base + o for _c, _l, _h, o, _n in self.meta]
        return secs, offs

    def copy_into(self, out) -> None:
        with open(self.path, "rb") as src:
            shutil.copyfileobj(src, out, 1 << 20)

    def read_bodies(self):
        """Stream (cid, lo, hi, body) back — one section in memory at a
        time (used for zoom reduction passes)."""
        with open(self.path, "rb") as src:
            for cid, lo, hi, _off, n in self.meta:
                yield cid, lo, hi, src.read(n)

    def unlink(self) -> None:
        try:
            os.unlink(self.path)
        except OSError:
            pass


def _rtree_spooled(spool: _SectionSpool, data_base: int, n_items: int,
                   index_off: int, per_slot: int) -> bytes:
    secs, offs = spool.sections_meta(data_base)
    leaf_items = b"".join(
        struct.pack("<IIIIQQ", cid, lo, cid, hi, off, n)
        for (cid, lo, hi, _b), off, (_c2, _l2, _h2, _o2, n)
        in zip(secs, offs, spool.meta))
    return struct.pack(
        "<IIQIIIIQII", _RTREE_MAGIC, max(len(secs), 1), n_items,
        min((c for c, *_ in secs), default=0),
        min((lo for _c, lo, _h, _b in secs), default=0),
        max((c for c, *_ in secs), default=0),
        max((hi for _c, _l, hi, _b in secs), default=0),
        index_off, per_slot, 0,
    ) + struct.pack("<BBH", 1, 0, len(secs)) + leaf_items


_UNSORTED_MSG = (
    "spool=true needs rows grouped by chrom and sorted by start within "
    "each chrom — df.sortWithinPartitions('chrom', 'start') before the "
    "write, or drop the spool option for the buffered path")


class BigBedWriter(_AlignmentWriter):
    """Minimal BigBed writer (same kent layout as `BigWigWriter`, item
    payloads = chromId/start/end + NUL-terminated rest text). Input rows
    carry ``chrom``/``start``/``end`` and optionally ``rest`` (the
    scan's own ``bed_schema=rest`` layout, so scan → write → scan
    round-trips bit-exactly). An ``autosql`` option embeds a declaration
    so readers (ours included) can type the rest columns."""

    SUFFIX = ".bb"

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        self.items_per_slot = int(options.get("items_per_slot", 512))
        self.autosql = options.get("autosql")
        self.spool = str(options.get("spool", "")).lower() in ("1", "true")

    def write(self, iterator: Iterator) -> _PartFile:
        if self.spool:
            return self._write_spooled(iterator)
        rows: list[tuple[str, int, int, str]] = []
        for row in iterator:
            d = row.asDict()
            rows.append((str(d["chrom"]), int(d["start"]), int(d["end"]),
                         d.get("rest") or ""))
        names: list[str] = []
        ids: dict[str, int] = {}
        sizes: dict[str, int] = {}
        for c, _s, e, _r in rows:
            if c not in ids:
                ids[c] = len(names)
                names.append(c)
            sizes[c] = max(sizes.get(c, 0), e)
        by_chrom: dict[str, list[tuple[int, int, str]]] = {}
        for c, s, e, r in rows:
            by_chrom.setdefault(c, []).append((s, e, r))
        sections: list[tuple[int, int, int, bytes]] = []
        for c in names:
            rs = sorted(by_chrom[c])
            for i in range(0, len(rs), self.items_per_slot):
                chunk = rs[i:i + self.items_per_slot]
                body = b"".join(
                    struct.pack("<III", ids[c], s, e)
                    + r.encode("utf-8") + b"\x00"
                    for s, e, r in chunk)
                sections.append(
                    (ids[c], chunk[0][0], max(x[1] for x in chunk), body))
        if len(names) > 0xFFFF or len(sections) > 0xFFFF:
            raise ValueError("single-leaf trees cap a part at 65535 "
                             "chromosomes/sections")

        n_rest = (rows[0][3].count("\t") + 1) if rows and rows[0][3] else 0
        if self.autosql:
            from oxbow_spark.models.autosql import parse_autosql

            n_rest = len(parse_autosql(self.autosql)[1]) - 3
        field_count = 3 + n_rest
        covered = sum(e - s for _c, s, e, _r in rows)
        summary = struct.pack("<Qdddd", covered, 0.0, 0.0, 0.0, 0.0)

        asql_b = (self.autosql.encode("utf-8") + b"\x00"
                  if self.autosql else b"")
        summary_off = 64
        asql_off = summary_off + 40 if asql_b else 0
        chrom_off = summary_off + 40 + len(asql_b)
        tree = _chrom_tree(names, sizes)
        data_off = chrom_off + len(tree)
        offs = []
        pos = data_off + 8
        for _cid, _lo, _hi, body in sections:
            offs.append(pos)
            pos += len(body)
        index_off = pos
        rtree = _rtree(sections, offs, len(rows), index_off,
                       self.items_per_slot)
        header = struct.pack(
            "<IHHQQQHHQQIQ", _BB_MAGIC, 4, 0, chrom_off, data_off,
            index_off, field_count, min(field_count, 12), asql_off,
            summary_off, 0, 0)
        out = self._part_path()
        with open(out, "wb") as f:
            f.write(header)
            f.write(summary)
            f.write(asql_b)
            f.write(tree)
            f.write(struct.pack("<Q", len(rows)))
            for _cid, _lo, _hi, body in sections:
                f.write(body)
            f.write(rtree)
        return _PartFile(out, len(rows))

    def _write_spooled(self, iterator: Iterator) -> _PartFile:
        """Bounded-memory path (``spool=true``): see
        `BigWigWriter._write_spooled` — grouped+sorted input, sections
        stream to a task-local spool, O(index) working set, byte-
        identical output to the buffered path for sorted input."""
        out = self._part_path()
        spool = _SectionSpool(out + ".spool")
        names: list[str] = []
        ids: dict[str, int] = {}
        max_end: dict[str, int] = {}
        chunk: list[tuple[int, int, str]] = []
        cur: str | None = None
        prev_start = -1
        n_rows = 0
        covered = 0
        first_rest: str | None = None

        def flush() -> None:
            if not chunk:
                return
            cid = ids[cur]
            body = b"".join(
                struct.pack("<III", cid, s, e) + r.encode("utf-8") + b"\x00"
                for s, e, r in chunk)
            spool.add(cid, chunk[0][0], max(x[1] for x in chunk), body)
            chunk.clear()

        try:
            for row in iterator:
                d = row.asDict()
                c = str(d["chrom"])
                st = int(d["start"])
                en = int(d["end"])
                rest = d.get("rest") or ""
                if first_rest is None:
                    first_rest = rest
                if c != cur:
                    if c in ids:
                        raise ValueError(_UNSORTED_MSG)
                    flush()
                    ids[c] = len(names)
                    names.append(c)
                    cur = c
                    prev_start = -1
                elif st < prev_start:
                    raise ValueError(_UNSORTED_MSG)
                prev_start = st
                chunk.append((st, en, rest))
                if len(chunk) >= self.items_per_slot:
                    flush()
                n_rows += 1
                covered += en - st
                max_end[c] = max(max_end.get(c, 0), en)
            flush()
            spool.close()
            if len(names) > 0xFFFF or len(spool.meta) > 0xFFFF:
                raise ValueError("single-leaf trees cap a part at 65535 "
                                 "chromosomes/sections")

            n_rest = ((first_rest.count("\t") + 1)
                      if n_rows and first_rest else 0)
            if self.autosql:
                from oxbow_spark.models.autosql import parse_autosql

                n_rest = len(parse_autosql(self.autosql)[1]) - 3
            field_count = 3 + n_rest
            summary = struct.pack("<Qdddd", covered, 0.0, 0.0, 0.0, 0.0)

            asql_b = (self.autosql.encode("utf-8") + b"\x00"
                      if self.autosql else b"")
            summary_off = 64
            asql_off = summary_off + 40 if asql_b else 0
            chrom_off = summary_off + 40 + len(asql_b)
            sizes = dict(max_end)
            tree = _chrom_tree(names, sizes)
            data_off = chrom_off + len(tree)
            index_off = data_off + 8 + spool.rel
            rtree = _rtree_spooled(spool, data_off + 8, n_rows, index_off,
                                   self.items_per_slot)
            header = struct.pack(
                "<IHHQQQHHQQIQ", _BB_MAGIC, 4, 0, chrom_off, data_off,
                index_off, field_count, min(field_count, 12), asql_off,
                summary_off, 0, 0)
            with open(out, "wb") as f:
                f.write(header)
                f.write(summary)
                f.write(asql_b)
                f.write(tree)
                f.write(struct.pack("<Q", n_rows))
                spool.copy_into(f)
                f.write(rtree)
            return _PartFile(out, n_rows)
        finally:
            spool.close()
            spool.unlink()


def _zoom_records(rows, ids: dict[str, int], reduction: int) -> list[bytes]:
    """BBI zoom reduction of (chrom, start, end, value) rows: one record
    per touched (chrom, bin) with coverage-weighted stats — the same
    semantics as `operators/zoom.py:zoom_aggregate` (verified against
    reference fixture zoom levels), computed here per part at write
    time. Returns packed 32-byte records sorted by (cid, bin)."""
    bins: dict[tuple[int, int], list] = {}
    for c, s, e, v in rows:
        cid = ids[c]
        for b in range(s // reduction, max((e - 1) // reduction, s // reduction) + 1):
            lo, hi = b * reduction, (b + 1) * reduction
            ov = min(e, hi) - max(s, lo)
            if ov <= 0:
                continue
            acc = bins.get((cid, b))
            if acc is None:
                bins[(cid, b)] = [ov, v, v, v * ov, v * v * ov]
            else:
                acc[0] += ov
                acc[1] = min(acc[1], v)
                acc[2] = max(acc[2], v)
                acc[3] += v * ov
                acc[4] += v * v * ov
    out = []
    for (cid, b), (valid, mn, mx, sm, ssq) in sorted(bins.items()):
        out.append(struct.pack(
            "<IIIIffff", cid, b * reduction, (b + 1) * reduction,
            valid, mn, mx, sm, ssq))
    return out


def _sectionize(records: list[bytes], per_slot: int) -> list[tuple[int, int, int, bytes]]:
    """Pack zoom records into R-tree sections (cid/lo/hi bounds from the
    records themselves)."""
    sections = []
    for i in range(0, len(records), per_slot):
        chunk = records[i:i + per_slot]
        firsts = [struct.unpack_from("<III", r) for r in chunk]
        cid = firsts[0][0]
        lo = min(s for _c, s, _e in firsts)
        hi = max(e for _c, _s, e in firsts)
        sections.append((cid, lo, hi, b"".join(chunk)))
    return sections


def _rtree(sections, offs, n_items: int, index_off: int, per_slot: int) -> bytes:
    leaf_items = b"".join(
        struct.pack("<IIIIQQ", cid, lo, cid, hi, off, len(body))
        for (cid, lo, hi, body), off in zip(sections, offs))
    return struct.pack(
        "<IIQIIIIQII", _RTREE_MAGIC, max(len(sections), 1), n_items,
        min((c for c, *_ in sections), default=0),
        min((lo for _c, lo, _h, _b in sections), default=0),
        max((c for c, *_ in sections), default=0),
        max((hi for _c, _l, hi, _b in sections), default=0),
        index_off, per_slot, 0,
    ) + struct.pack("<BBH", 1, 0, len(sections)) + leaf_items


class BigWigWriter(_AlignmentWriter):
    SUFFIX = ".bw"

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options, overwrite)
        self.items_per_slot = int(options.get("items_per_slot", 512))
        self.chrom_sizes: dict[str, int] = {}
        for spec in (options.get("chrom_sizes") or "").split(","):
            if ":" in spec:
                nm, _, sz = spec.strip().partition(":")
                self.chrom_sizes[nm] = int(sz)
        zr = options.get("zoom_reductions")  # "" → no zoom levels
        self.zoom_reductions = (
            [int(x) for x in zr.split(",") if x.strip()]
            if zr is not None else None)  # None → derive a default ladder
        self.spool = str(options.get("spool", "")).lower() in ("1", "true")

    def write(self, iterator: Iterator) -> _PartFile:
        if self.spool:
            return self._write_spooled(iterator)
        rows: list[tuple[str, int, int, float]] = []
        for row in iterator:
            d = row.asDict()
            rows.append((str(d["chrom"]), int(d["start"]), int(d["end"]),
                         float(d["value"] if d.get("value") is not None
                               else 0.0)))
        names: list[str] = []
        ids: dict[str, int] = {}
        for c, _s, _e, _v in rows:
            if c not in ids:
                ids[c] = len(names)
                names.append(c)
        if len(names) > 0xFFFF:
            raise ValueError("single-leaf chrom tree caps a part at 65535 "
                             "chromosomes — raise the partition count")
        sizes = dict(self.chrom_sizes)
        for c, _s, e, _v in rows:
            if c not in self.chrom_sizes:
                sizes[c] = max(sizes.get(c, 0), e)

        # sections: per chromosome, items_per_slot rows each
        sections: list[tuple[int, int, int, bytes]] = []  # cid, s, e, payload
        by_chrom: dict[str, list[tuple[int, int, float]]] = {}
        for c, s, e, v in rows:
            by_chrom.setdefault(c, []).append((s, e, v))
        for c in names:
            rs = sorted(by_chrom[c])
            for i in range(0, len(rs), self.items_per_slot):
                chunk = rs[i:i + self.items_per_slot]
                lo, hi = chunk[0][0], max(x[1] for x in chunk)
                body = struct.pack("<IIIIIBBH", ids[c], lo, hi, 0, 0, 1, 0,
                                   len(chunk))
                body += b"".join(struct.pack("<IIf", s, e, v)
                                 for s, e, v in chunk)
                sections.append((ids[c], lo, hi, body))
        if len(sections) > 0xFFFF:
            raise ValueError("single-leaf R-tree caps a part at 65535 "
                             "sections — raise items_per_slot")

        vals = [v for _c, _s, _e, v in rows]
        covered = sum(e - s for _c, s, e, _v in rows)
        summary = struct.pack(
            "<Qdddd", covered, min(vals, default=0.0), max(vals, default=0.0),
            sum(v * (e - s) for _c, s, e, v in rows),
            sum(v * v * (e - s) for _c, s, e, v in rows))

        # zoom reduction ladder: kent-style default — 10× the mean
        # interval, ×4 per level, while a level still reduces the data
        reductions = self.zoom_reductions
        if reductions is None and rows:
            mean_len = max(1, covered // len(rows))
            span = max(sizes.values(), default=0)
            reductions, r = [], max(16, 10 * mean_len)
            while len(reductions) < 10 and r < span:
                reductions.append(r)
                r *= 4
        reductions = reductions or []
        zoom_levels = []  # (reduction, sections)
        for r in reductions:
            recs = _zoom_records(rows, ids, r)
            if not recs:
                continue
            zoom_levels.append((r, _sectionize(recs, self.items_per_slot)))

        header_sz = 64 + 24 * len(zoom_levels)
        summary_off = header_sz
        chrom_off = summary_off + 40
        tree = _chrom_tree(names, sizes)
        data_off = chrom_off + len(tree)
        # u64 section count precedes the data sections (kent dataCount)
        offs = []
        pos = data_off + 8
        for _cid, _lo, _hi, body in sections:
            offs.append(pos)
            pos += len(body)
        index_off = pos
        rtree = _rtree(sections, offs, len(rows), index_off,
                       self.items_per_slot)
        pos = index_off + len(rtree)

        # zoom level payloads follow the main index: per level a u32
        # record count, the sections, then that level's own R-tree
        zheaders = []
        zblobs = []
        for r, zsecs in zoom_levels:
            zdata_off = pos
            n_recs = sum(len(b) // 32 for _c, _l, _h, b in zsecs)
            zoffs = []
            zpos = zdata_off + 4
            for _cid, _lo, _hi, body in zsecs:
                zoffs.append(zpos)
                zpos += len(body)
            zindex_off = zpos
            ztree = _rtree(zsecs, zoffs, n_recs, zindex_off,
                           self.items_per_slot)
            zheaders.append(struct.pack("<IIQQ", r, 0, zdata_off, zindex_off))
            zblobs.append(struct.pack("<I", n_recs)
                          + b"".join(b for _c, _l, _h, b in zsecs) + ztree)
            pos = zindex_off + len(ztree)

        header = struct.pack(
            "<IHHQQQHHQQIQ", _BW_MAGIC, 4, len(zoom_levels), chrom_off,
            data_off, index_off, 0, 0, 0, summary_off, 0, 0)

        out = self._part_path()
        with open(out, "wb") as f:
            f.write(header)
            f.write(b"".join(zheaders))
            f.write(summary)
            f.write(tree)
            f.write(struct.pack("<Q", len(sections)))
            for _cid, _lo, _hi, body in sections:
                f.write(body)
            f.write(rtree)
            for blob in zblobs:
                f.write(blob)
        return _PartFile(out, len(rows))

    def _write_spooled(self, iterator: Iterator) -> _PartFile:
        """Bounded-memory path (``spool=true``): grouped+sorted input
        streams section-by-section into a task-local spool file; the
        in-memory state is the chrom table, one pending chunk, running
        summary stats, section metadata, and zoom bin accumulators —
        O(index), never O(part). Zoom levels re-read the spool one
        section at a time. Produces byte-identical files to the buffered
        path for input already sorted by (chrom, start)."""
        out = self._part_path()
        spool = _SectionSpool(out + ".spool")
        names: list[str] = []
        ids: dict[str, int] = {}
        max_end: dict[str, int] = {}
        chunk: list[tuple[int, int, float]] = []
        cur: str | None = None
        prev_start = -1
        n_rows = 0
        covered = 0
        vmin = vmax = None
        vsum = vssq = 0.0

        def flush() -> None:
            if not chunk:
                return
            cid = ids[cur]
            lo, hi = chunk[0][0], max(x[1] for x in chunk)
            body = struct.pack("<IIIIIBBH", cid, lo, hi, 0, 0, 1, 0,
                               len(chunk))
            body += b"".join(struct.pack("<IIf", s, e, v)
                             for s, e, v in chunk)
            spool.add(cid, lo, hi, body)
            chunk.clear()

        try:
            for row in iterator:
                d = row.asDict()
                c = str(d["chrom"])
                st = int(d["start"])
                en = int(d["end"])
                v = float(d["value"] if d.get("value") is not None else 0.0)
                if c != cur:
                    if c in ids:  # chrom reappeared: not grouped
                        raise ValueError(_UNSORTED_MSG)
                    flush()
                    ids[c] = len(names)
                    names.append(c)
                    cur = c
                    prev_start = -1
                elif st < prev_start:
                    raise ValueError(_UNSORTED_MSG)
                prev_start = st
                chunk.append((st, en, v))
                if len(chunk) >= self.items_per_slot:
                    flush()
                n_rows += 1
                covered += en - st
                vmin = v if vmin is None else min(vmin, v)
                vmax = v if vmax is None else max(vmax, v)
                vsum += v * (en - st)
                vssq += v * v * (en - st)
                max_end[c] = max(max_end.get(c, 0), en)
            flush()
            spool.close()
            if len(names) > 0xFFFF or len(spool.meta) > 0xFFFF:
                raise ValueError("single-leaf trees cap a part at 65535 "
                                 "chromosomes/sections")

            sizes = dict(self.chrom_sizes)
            for c, e in max_end.items():
                if c not in self.chrom_sizes:
                    sizes[c] = max(sizes.get(c, 0), e)
            summary = struct.pack("<Qdddd", covered, vmin or 0.0,
                                  vmax or 0.0, vsum, vssq)

            reductions = self.zoom_reductions
            if reductions is None and n_rows:
                mean_len = max(1, covered // n_rows)
                span = max(sizes.values(), default=0)
                reductions, r = [], max(16, 10 * mean_len)
                while len(reductions) < 10 and r < span:
                    reductions.append(r)
                    r *= 4
            reductions = reductions or []
            zoom_levels = []
            for r in reductions:
                bins: dict[tuple[int, int], list] = {}
                for cid, _lo, _hi, body in spool.read_bodies():
                    (cnt,) = struct.unpack_from("<H", body, 22)
                    for i in range(cnt):
                        st, en, v = struct.unpack_from("<IIf", body,
                                                       24 + 12 * i)
                        for b in range(st // r,
                                       max((en - 1) // r, st // r) + 1):
                            lo2, hi2 = b * r, (b + 1) * r
                            ov = min(en, hi2) - max(st, lo2)
                            if ov <= 0:
                                continue
                            acc = bins.get((cid, b))
                            if acc is None:
                                bins[(cid, b)] = [ov, v, v, v * ov,
                                                  v * v * ov]
                            else:
                                acc[0] += ov
                                acc[1] = min(acc[1], v)
                                acc[2] = max(acc[2], v)
                                acc[3] += v * ov
                                acc[4] += v * v * ov
                recs = [struct.pack("<IIIIffff", cid, b * r, (b + 1) * r,
                                    valid, mn, mx, sm, ssq)
                        for (cid, b), (valid, mn, mx, sm, ssq)
                        in sorted(bins.items())]
                if recs:
                    zoom_levels.append(
                        (r, _sectionize(recs, self.items_per_slot)))

            header_sz = 64 + 24 * len(zoom_levels)
            summary_off = header_sz
            chrom_off = summary_off + 40
            tree = _chrom_tree(names, sizes)
            data_off = chrom_off + len(tree)
            index_off = data_off + 8 + spool.rel
            rtree = _rtree_spooled(spool, data_off + 8, n_rows, index_off,
                                   self.items_per_slot)
            pos = index_off + len(rtree)

            zheaders = []
            zblobs = []
            for r, zsecs in zoom_levels:
                zdata_off = pos
                n_recs = sum(len(b) // 32 for _c, _l, _h, b in zsecs)
                zoffs = []
                zpos = zdata_off + 4
                for _cid, _lo, _hi, body in zsecs:
                    zoffs.append(zpos)
                    zpos += len(body)
                zindex_off = zpos
                ztree = _rtree(zsecs, zoffs, n_recs, zindex_off,
                               self.items_per_slot)
                zheaders.append(struct.pack("<IIQQ", r, 0, zdata_off,
                                            zindex_off))
                zblobs.append(struct.pack("<I", n_recs)
                              + b"".join(b for _c, _l, _h, b in zsecs)
                              + ztree)
                pos = zindex_off + len(ztree)

            header = struct.pack(
                "<IHHQQQHHQQIQ", _BW_MAGIC, 4, len(zoom_levels), chrom_off,
                data_off, index_off, 0, 0, 0, summary_off, 0, 0)
            with open(out, "wb") as f:
                f.write(header)
                f.write(b"".join(zheaders))
                f.write(summary)
                f.write(tree)
                f.write(struct.pack("<Q", len(spool.meta)))
                spool.copy_into(f)
                f.write(rtree)
                for blob in zblobs:
                    f.write(blob)
            return _PartFile(out, n_rows)
        finally:
            spool.close()
            spool.unlink()
