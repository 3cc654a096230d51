"""SAM DataSource: ``spark.read.format("sam")``.

Parity: reference SAM scanner (`oxbow/src/alignment/scanner/sam.rs`,
SURVEY S1) — 12 standard fields + opt-in ``tags`` struct
(`alignment/model.rs:59-125`). Options:

- ``fields``: projection over the standard fields
- ``tags``: 'scan' | 'scan:N' — driver-side tag-def sampling
  (``tag_defs(scan_rows)``, `alignment/scanner/bam.rs:122-149`)
- ``tag_defs``: explicit ``NM:i,MD:Z,...`` comma list
- ``coords``: '11' (native) | '01' — shifts ``pos``/``pnext`` by −1
- ``regions`` (';'-separated; ``*`` selects unmapped reads, SURVEY F2),
  ``batch_size``, ``limit``, ``partition_bytes``

Missing-value semantics: ``*`` → null for qname/rname/rnext/cigar/seq/
qual; pos/pnext 0 → null; mapq 255 → null; ``rnext='='`` resolves to
rname; ``end`` is the computed 1-based inclusive alignment end
(pos + reference-consumed CIGAR − 1, `alignment/model/field.rs:280-286`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from oxbow_spark.models.sam_header import (
    STANDARD_FIELD_NAMES,
    STANDARD_FIELDS,
    SamHeader,
    TagDef,
    alignment_end,
    scan_tag_defs,
    split_sam_tag,
    tags_struct,
)
from oxbow_spark.sources.base import Codec, TextFormatSource, open_text, select_fields


@dataclass
class SamCodec(Codec):
    tag_defs: tuple[TagDef, ...] = ()
    with_tags: bool = False

    def parse_line(self, line: str) -> list | None:
        c = line.split("\t")
        if len(c) < 11:
            raise ValueError(f"malformed SAM line: {line[:80]!r}")
        pos = int(c[3])
        mapq = int(c[4])
        rname = None if c[2] == "*" else c[2]
        cigar = None if c[5] == "*" else c[5]
        pos_v = None if pos == 0 else pos
        row = [
            None if c[0] == "*" else c[0],
            int(c[1]),
            rname,
            pos_v,
            None if mapq == 255 else mapq,
            cigar,
            rname if c[6] == "=" else (None if c[6] == "*" else c[6]),
            None if c[7] == "0" else int(c[7]),
            int(c[8]),
            None if c[9] == "*" else c[9],
            None if c[10] == "*" else c[10],
            alignment_end(pos_v, cigar),
        ]
        if self.with_tags:
            vals: dict = {}
            for f in c[11:]:
                try:
                    name, code, raw = split_sam_tag(f)
                except ValueError:
                    continue
                vals[name] = (code, raw)
            row.append({
                d.name: (d.parse(*vals[d.name]) if d.name in vals else None)
                for d in self.tag_defs
            })
        return row

    def interval(self, row: list):
        if row[2] is None or row[3] is None:
            return (None, 0, None)  # unmapped — matched only by region '*'
        end = row[11] if row[11] is not None else row[3]
        return (row[2], row[3] - 1, end)


class SamDataSource(TextFormatSource):
    NATIVE_CS = "11"

    @classmethod
    def name(cls) -> str:
        return "sam"

    def header(self) -> SamHeader:
        lines = []
        with open_text(self.paths[0]) as f:
            for line in f:
                if not line.startswith("@"):
                    break
                lines.append(line)
        return SamHeader.parse(lines)

    def _tag_defs(self) -> list[TagDef] | None:
        explicit = self.options.get("tag_defs")
        if explicit:
            return [
                TagDef(*spec.strip().split(":", 1)) for spec in explicit.split(",")
            ]
        scan = self.options.get("tags")
        if not scan:
            return None
        n = int(scan.split(":")[1]) if ":" in scan else 1024
        recs: list[str] = []
        with open_text(self.paths[0]) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                recs.append(line)
                if len(recs) >= n:
                    break
        return scan_tag_defs(recs, n)

    def _codec(self) -> SamCodec:
        names = select_fields(STANDARD_FIELD_NAMES, self.options.get("fields"))
        fields = [T.StructField(nm, dict(STANDARD_FIELDS)[nm], True) for nm in names]
        defs = self._tag_defs()
        layout = list(STANDARD_FIELD_NAMES)
        if defs is not None:
            fields.append(T.StructField("tags", tags_struct(defs), True))
            layout.append("tags")
            names = names + ["tags"]
        proj = tuple(layout.index(n) for n in names)
        return SamCodec(
            schema=T.StructType(fields),
            tag_defs=tuple(defs or ()),
            with_tags=defs is not None,
            project_indexes=None if list(proj) == list(range(len(layout))) else proj,
            start_field_indexes=(3, 7),  # pos, pnext
            coord_col_names=("rname", "pos"),
            meta_anywhere=False,
            meta_prefixes=("@",),
        )
