"""BED / bedGraph DataSource: ``spark.read.format("bed")``.

Parity: reference BED scanner (`oxbow/src/bed/scanner/bed.rs`, schema
grammar `bed/model/schema.rs:66-215`, SURVEY S8). Options:

- ``bed_schema``: bed | bed{n} | bed{n}+{m} | bed{n}+ | bedgraph
  (default ``bed6``; bare ``bed`` ≡ bed6 as in the reference)
- ``fields``: comma list projecting columns (Select::Some; unknown → error)
- ``coords``: '01' (native) | '11' — shifts ``start``/``thickStart`` by +1
- ``regions``: ';'-separated region strings (UCSC/bracket); residual
  overlap filter per record
- ``batch_size``, ``limit``, ``partition_bytes``
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from oxbow_spark.models.bed_schema import STANDARD_FIELD_NAMES, BedSchema
from oxbow_spark.sources.base import Codec, TextFormatSource, select_fields

_META = ("#", "track", "browser")


@dataclass
class BedCodec(Codec):
    bed_schema: BedSchema = None  # type: ignore[assignment]

    def parse_line(self, line: str) -> list | None:
        return self.bed_schema.parse_line(line)

    def interval(self, row: list):
        # full-row layout: chrom, start, end are always fields 0..2
        return (row[0], row[1], row[2])


class BedDataSource(TextFormatSource):
    NATIVE_CS = "01"

    @classmethod
    def name(cls) -> str:
        return "bed"

    def _codec(self) -> BedCodec:
        bs = BedSchema.parse(self.options.get("bed_schema", "bed6"))
        full = bs.to_struct()
        names = select_fields(bs.field_names, self.options.get("fields"))
        proj = tuple(bs.field_names.index(n) for n in names)
        schema = T.StructType([full[n] for n in names])
        start_idx = tuple(
            i for i, nm in enumerate(bs.field_names) if nm in ("start", "thickStart")
        )
        return BedCodec(
            schema=schema,
            bed_schema=bs,
            project_indexes=None if list(proj) == list(range(len(bs.field_names))) else proj,
            start_field_indexes=start_idx,
            coord_col_names=("chrom", "start"),
            meta_anywhere=True,
            meta_prefixes=_META,
        )
