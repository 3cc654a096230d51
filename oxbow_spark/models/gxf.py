"""GTF/GFF3 ("GXF") attribute model.

Parity targets (`oxbow/src/gxf/model/field.rs:40-51`,
`gxf/model/attribute.rs:48-61`, scanning `gxf/scanner/gtf.rs:117-151`):

- Fixed 8 standard fields: seqid source type start end score strand frame
  (Utf8 / Int32 / Float32 / UInt8 as mapped in SURVEY §1.3).
- ``attributes``: a struct column whose sub-fields come from scanning the
  first N records (``attribute_defs(scan_rows)``) or are user-supplied.
  Attribute values are String, or Array (List<Utf8>) when a key repeats
  within one record (the GTF ``tag`` convention).
- GTF attribute syntax: ``key "value"; key2 "v2";`` (values may be
  unquoted numbers); GFF3 syntax: ``key=value;key2=v,alternatives``
  (%-escaped; multi-valued on ',').
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import types as T

STANDARD_FIELDS: list[tuple[str, T.DataType]] = [
    ("seqid", T.StringType()),
    ("source", T.StringType()),
    ("type", T.StringType()),
    ("start", T.IntegerType()),
    ("end", T.IntegerType()),
    ("score", T.FloatType()),
    ("strand", T.StringType()),
    ("frame", T.ShortType()),
]
STANDARD_FIELD_NAMES = [n for n, _ in STANDARD_FIELDS]


@dataclass(frozen=True)
class AttributeDef:
    name: str
    is_array: bool  # True → List<Utf8> (repeated key), else Utf8

    @property
    def spark_type(self) -> T.DataType:
        return T.ArrayType(T.StringType()) if self.is_array else T.StringType()


def parse_attributes(raw: str, flavor: str) -> dict[str, list[str]]:
    """Parse an attribute column into {key: [values...]} (values always
    listed; single-valued keys get a 1-list). flavor: 'gtf' | 'gff'."""
    out: dict[str, list[str]] = {}
    raw = raw.strip()
    if not raw or raw == ".":
        return out
    if flavor == "gtf":
        for part in raw.split(";"):
            part = part.strip()
            if not part:
                continue
            key, _, val = part.partition(" ")
            val = val.strip()
            if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
                val = val[1:-1]
            out.setdefault(key, []).append(val)
    else:
        for part in raw.split(";"):
            part = part.strip()
            if not part:
                continue
            key, _, val = part.partition("=")
            vals = [unquote(v) for v in val.split(",")]
            out.setdefault(key, []).extend(vals)
    return out


def scan_attribute_defs(
    lines: list[str], flavor: str, scan_rows: int = 1024
) -> list[AttributeDef]:
    """Discover attribute keys (and arrayness) from up to scan_rows data
    lines, preserving first-seen order — the analog of the reference's
    ``attribute_defs(scan_rows)`` driver-side sampling."""
    order: list[str] = []
    is_array: dict[str, bool] = {}
    for line in lines[:scan_rows]:
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 9:
            continue
        attrs = parse_attributes(cols[8], flavor)
        for k, vs in attrs.items():
            if k not in is_array:
                order.append(k)
                is_array[k] = False
            if len(vs) > 1:
                is_array[k] = True
    return [AttributeDef(k, is_array[k]) for k in order]


def attributes_struct(defs: list[AttributeDef]) -> T.StructType:
    return T.StructType([T.StructField(d.name, d.spark_type, True) for d in defs])
